"""Throughput/usage example (reference vmas/examples/use_vmas_env.py).

Steps a scenario with random actions and prints wall-clock numbers for both
the per-call API and the compiled lax.scan rollout.
"""

import argparse
import time

import jax

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn


def run(scenario="transport", num_envs=4096, n_steps=200, render=False, **kwargs):
    env = make_env(scenario, num_envs=num_envs, seed=0, **kwargs)

    # Per-call API
    acts = env.get_random_actions()
    env.step(acts)  # compile
    t0 = time.perf_counter()
    for _ in range(n_steps):
        obs, rews, dones, infos = env.step(acts)
        if render:
            env.render(mode="rgb_array")
    jax.block_until_ready(obs[0])
    dt = time.perf_counter() - t0
    print(
        f"[per-call] {scenario}: {n_steps} steps x {num_envs} envs in {dt:.2f}s "
        f"-> {n_steps * num_envs / dt:,.0f} env-steps/s"
    )

    # Compiled rollout
    runner = jax.jit(rollout_fn(env, horizon=n_steps))
    state, steps, traj = runner(env.state, env.steps, jax.random.PRNGKey(0))
    jax.block_until_ready(traj["rewards"])  # compile
    t0 = time.perf_counter()
    state, steps, traj = runner(state, steps, jax.random.PRNGKey(1))
    jax.block_until_ready(traj["rewards"])
    dt = time.perf_counter() - t0
    print(
        f"[compiled] {scenario}: {n_steps} steps x {num_envs} envs in {dt:.2f}s "
        f"-> {n_steps * num_envs / dt:,.0f} env-steps/s"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="transport")
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--n_steps", type=int, default=200)
    p.add_argument("--render", action="store_true")
    args = p.parse_args()
    run(args.scenario, args.num_envs, args.n_steps, args.render)
