"""End-to-end PPO training on a vmas_tpu scenario (multi-agent, shared policy).

The RL-framework example the reference ships as ``vmas/examples/rllib.py``
(RLlib PPO + wandb); the TPU-native equivalent keeps the whole
rollout-collect + GAE + clipped-surrogate update as ONE jitted program per
phase, sharded over the env-axis Mesh: every chip steps its env shard and
evaluates the policy on it, gradients all-reduce over ICI (XLA inserts the
collectives from the shardings).

The PPO machinery lives in ``vmas_tpu.parallel.ppo`` (this file is the CLI).
``--collect rows`` uses the rows-carried collection fast path (one fused
pallas kernel call per step; see parallel/rollout.py) when the env is
eligible; ``--collect step`` is the per-step-autoreset episodic path.

Run (single chip, or a pod slice, or a virtual CPU mesh):
  python -m examples.train_ppo --scenario transport --num_envs 512 --iters 20
  python -m examples.train_ppo --num_envs 256 --virtual_devices 8
"""

import argparse
import time

import jax


def main(scenario="transport", num_envs=512, iters=50, horizon=32, lr=3e-4,
         virtual_devices=0, seed=0, collect="auto", fused_physics=False,
         bf16=False):
    if virtual_devices:
        jax.config.update("jax_num_cpu_devices", int(virtual_devices))
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax  # noqa: F401  (fail fast if unavailable)

    from vmas_tpu import make_env
    from vmas_tpu.parallel import distribute
    from vmas_tpu.parallel.ppo import (
        init_actor_critic, make_ppo_update, obs_dim_of,
    )

    env = make_env(
        scenario, num_envs=num_envs, seed=seed, fused_physics=fused_physics
    )
    distribute(env)  # env-axis mesh over all devices (asserts divisibility)
    mesh = env.mesh
    print(f"mesh: {mesh.devices.size} devices, {num_envs} envs "
          f"({num_envs // mesh.devices.size}/device)")

    params = init_actor_critic(
        jax.random.PRNGKey(seed), obs_dim_of(env), env.agents[0].action_size
    )
    update, opt = make_ppo_update(
        env, horizon=horizon, lr=lr, collect=collect,
        compute_dtype=jnp.bfloat16 if bf16 else None,
    )
    opt_state = opt.init(params)
    state = env.state
    steps = env.steps

    step_fn = jax.jit(update)
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    for it in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, state, steps, metrics = step_fn(
            params, opt_state, state, steps, k
        )
        if it % 5 == 0 or it == iters - 1:
            print(
                f"iter {it:4d}  loss {float(metrics['loss']):+.4f}  "
                f"mean_rew {float(metrics['mean_reward']):+.4f}  "
                f"done_frac {float(metrics['episode_done_frac']):.3f}"
            )
    dt = time.perf_counter() - t0
    sps = iters * horizon * num_envs / dt
    print(f"{iters} PPO iters x {horizon} steps x {num_envs} envs in {dt:.1f}s "
          f"= {sps:,.0f} env-steps/s (incl. learning)")
    return params


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario", default="transport")
    p.add_argument("--num_envs", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--virtual_devices", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--collect", default="auto", choices=["auto", "rows", "step"])
    p.add_argument("--fused_physics", action="store_true",
                   help="fused pallas physics (required for rows collection)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MLP matmuls with f32 accumulation")
    args = p.parse_args()
    main(**vars(args))
