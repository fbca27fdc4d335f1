"""Run a scenario's HeuristicPolicy (reference vmas/examples/run_heuristic.py).

Usage:  python examples/run_heuristic.py --scenario transport --num_envs 32
Scenarios with heuristics: transport, balance, wheel, flocking, navigation,
discovery.
"""

import argparse
import importlib
import time

import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env


def run_heuristic(
    scenario_name="transport",
    num_envs=32,
    n_steps=200,
    render=False,
    save_render=False,
    **kwargs,
):
    module = importlib.import_module(f"vmas_tpu.scenarios.{scenario_name}")
    policy = module.HeuristicPolicy(continuous_action=True)

    env = make_env(scenario_name, num_envs=num_envs, seed=0, **kwargs)
    obs = env.reset(seed=0)

    frames = []
    total_reward = 0.0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        actions = [
            policy.compute_action(jnp.asarray(o), u_range=float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, info = env.step(actions)
        total_reward += float(np.mean([np.asarray(r) for r in rews]))
        if render:
            frames.append(env.render(mode="rgb_array", env_index=0))
    dt = time.perf_counter() - t0

    print(
        f"{scenario_name}: {n_steps} steps x {num_envs} envs in {dt:.2f}s, "
        f"mean reward/step {total_reward / n_steps:.3f}"
    )
    if render and save_render:
        from vmas_tpu.render.video import save_video

        save_video(scenario_name, frames, fps=1 / 0.1)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenario", default="transport")
    parser.add_argument("--num_envs", type=int, default=32)
    parser.add_argument("--n_steps", type=int, default=200)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--save_render", action="store_true")
    args = parser.parse_args()
    run_heuristic(
        scenario_name=args.scenario,
        num_envs=args.num_envs,
        n_steps=args.n_steps,
        render=args.render,
        save_render=args.save_render,
    )
