"""MPE-comparison speed sweep (reference protocol on TPU).

Mirrors the reference study `mpe_comparison/mpe_performance_comparison.py`
(run_vmas_simple_spread, lines 59-87): `simple_spread`, 3 agents, discrete
actions (every agent holds action 2), 100 steps, wall-clock seconds swept
over num_envs. Two timings per point:

* `loop` — per-step `env.step()` from Python, like the reference's loop
  (includes host dispatch per step);
* `scan` — the compiled `lax.scan` rollout of the same 100 steps (the
  TPU-native fast path; one device program, no host round-trips).

Usage (from the repo root; -m puts the package on sys.path):
  python -m examples.speed_sweep [--n_envs 1 32 256 1024 4096 16384 30000]

Measured on one TPU v5e chip: 30,000 envs x 100 steps in 0.061 s compiled
(48.9M env-steps/s) — the reference paper's headline claim for this exact
protocol is "30,000 envs in under 10 s" (arXiv:2207.03530).
"""

import argparse
import time

import jax
import jax.numpy as jnp

from vmas_tpu import make_env

N_AGENTS = 3
N_STEPS = 100


def run_point(n_envs: int, fused: bool = False):
    env = make_env(
        "simple_spread",
        num_envs=n_envs,
        seed=0,
        continuous_actions=False,
        n_agents=N_AGENTS,
        fused_physics=fused,
    )
    actions = [jnp.full((n_envs, 1), 2, jnp.int32) for _ in range(N_AGENTS)]

    # --- python-loop path (reference protocol) ---
    env.step(actions)  # compile outside the timed region, like the
    env.reset(seed=0)  # reference's warm torch kernels
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        out = env.step(actions)
    jax.block_until_ready(out[0])
    t_loop = time.perf_counter() - t0

    # --- compiled-scan path ---
    def body(carry, key):
        state, steps = carry
        state, obs, rews, term, trunc, infos, steps = env._step_fn_raw(
            state, steps, actions, key
        )
        return (state, steps), (obs, rews)

    @jax.jit
    def run(state, steps, key):
        keys = jax.random.split(key, N_STEPS)
        return jax.lax.scan(body, (state, steps), keys)

    env.reset(seed=0)
    (state, steps), traj = run(env.state, env.steps, jax.random.PRNGKey(0))
    jax.block_until_ready(traj[1][0])
    env.reset(seed=0)
    t0 = time.perf_counter()
    (state, steps), traj = run(env.state, env.steps, jax.random.PRNGKey(0))
    jax.block_until_ready(traj[1][0])
    t_scan = time.perf_counter() - t0

    # --- rows-carried path (fused only): the scan carries the kernel's own
    # row buffer, one pallas call per step, same fixed discrete actions ---
    t_rows = None
    from vmas_tpu.parallel.rollout import (
        _decode_u_horizon, rows_rollout_supported,
    )
    if rows_rollout_supported(env):
        from vmas_tpu.core import fused as F

        world, fo = env.world, env._fused_outputs
        bp = -(-n_envs // 128) * 128
        step = F.make_rows_step(world, fo, [a.index for a in env.agents], bp)
        us = [_decode_u_horizon(env, a, jnp.full((N_STEPS, n_envs), 2,
                                                 jnp.int32))
              for a in env.agents]
        ax = jnp.stack([u[..., 0] for u in us], axis=1)
        ay = jnp.stack([u[..., 1] for u in us], axis=1)
        act_rows = jnp.concatenate([ax, ay], axis=1)  # [T, 2A, B]
        a_blk = -(-act_rows.shape[1] // 8) * 8
        act_rows = jnp.pad(
            act_rows,
            ((0, 0), (0, a_blk - act_rows.shape[1]), (0, bp - n_envs)),
        )

        @jax.jit
        def run_rows(state, act_rows):
            carry0 = F.pack_carry(world, state, fo, bp)
            carryT, extras = jax.lax.scan(step, carry0, act_rows, unroll=8)
            return F.unpack_carry(world, carryT, state), extras

        env.reset(seed=0)
        s, extras = run_rows(env.state, act_rows)
        jax.block_until_ready(extras)
        env.reset(seed=0)
        t0 = time.perf_counter()
        s, extras = run_rows(env.state, act_rows)
        jax.block_until_ready(extras)
        t_rows = time.perf_counter() - t0
    return t_loop, t_scan, t_rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--n_envs", type=int, nargs="+",
        default=[1, 32, 256, 1024, 4096, 16384, 30000],
    )
    args = p.parse_args()
    dev = jax.devices()[0]
    print(f"simple_spread, {N_AGENTS} agents, {N_STEPS} steps on "
          f"{dev.platform}:{dev.device_kind}")
    print(f"{'n_envs':>8} {'loop s':>9} {'scan s':>9} {'scan env-steps/s':>17}"
          f" {'fused s':>9} {'fused env-steps/s':>18}"
          f" {'rows s':>9} {'rows env-steps/s':>17}")
    for n in args.n_envs:
        t_loop, t_scan, _ = run_point(n)
        # beyond-protocol best paths: physics + obs/reward emitted from ONE
        # pallas kernel (simple_spread.make_fused_outputs), and the
        # rows-carried scan of that kernel's own row buffer
        _, t_fused, t_rows = run_point(n, fused=True)
        # t_rows is None when the fused config is not rows-eligible
        # (rows_rollout_supported False) — print blank columns, don't crash
        rows_t = "-" if t_rows is None else f"{t_rows:9.3f}"
        rows_r = "-" if t_rows is None else f"{n * N_STEPS / t_rows:17,.0f}"
        print(f"{n:>8} {t_loop:>9.3f} {t_scan:>9.3f} "
              f"{n * N_STEPS / t_scan:>17,.0f} {t_fused:>9.3f} "
              f"{n * N_STEPS / t_fused:>18,.0f} {rows_t:>9} "
              f"{rows_r:>17}")


if __name__ == "__main__":
    main()
