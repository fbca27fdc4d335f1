#!/usr/bin/env python
"""Split the rows scan's residual ~20 us/step (VERDICT r4 weak #2): how much
is EXTRAS RECORDING (stacking the emit rows into the [T, n_out, B] ys
buffer) vs XS SLICING (the per-step action-row slice) vs the bare kernel.

Same-process grouped A/B at 500-step calls (docs/PERFORMANCE.md
discipline). Variants, all the SAME pallas step at unroll=8:

  full     rows_rollout_fn bench path (xs action rows + extras recorded)
  noemit   same scan, extras DISCARDED (ys=None) — kernel still computes
           them (pallas outputs are opaque), only the [T,n_out,B] stacking
           and its HBM writes drop out
  noxs     constant action rows (no xs slicing), extras recorded
  bare     constant action rows AND extras discarded — the kernel floor

Run ON THE CHIP (no timeout wrap):
  nohup python tests/golden/time_rows_split.py > /tmp/rows_split.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

NUM_ENVS = 4096
N_AGENTS = 4
HORIZON = 500
REPS = 4
GROUPS = 2
UNROLL = 8


def main():
    from vmas_tpu import make_env
    from vmas_tpu.core import fused as F
    from vmas_tpu.parallel.rollout import (
        _decode_u_horizon, _random_actions_for_horizon, rows_rollout_fn,
    )

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    env = make_env("transport", num_envs=NUM_ENVS, n_agents=N_AGENTS,
                   seed=0, fused_physics=True)
    world, fo = env.world, env._fused_outputs
    agents = env.agents
    bp = -(-NUM_ENVS // 128) * 128
    step = F.make_rows_step(world, fo, [a.index for a in agents], bp)

    def make_act_rows(key):
        acts = _random_actions_for_horizon(env, key, HORIZON)
        us = [_decode_u_horizon(env, a, acts[i]) for i, a in enumerate(agents)]
        ax = jnp.stack([u[..., 0] for u in us], axis=1)
        ay = jnp.stack([u[..., 1] for u in us], axis=1)
        act_rows = jnp.concatenate([ax, ay], axis=1)
        a_blk = -(-act_rows.shape[1] // 8) * 8
        return jnp.pad(
            act_rows,
            ((0, 0), (0, a_blk - act_rows.shape[1]), (0, bp - NUM_ENVS)),
        )

    @jax.jit
    def run_full(state, key):
        carry0 = F.pack_carry(world, state, fo, bp)
        carryT, extras = jax.lax.scan(
            step, carry0, make_act_rows(key), unroll=UNROLL
        )
        return carryT, extras

    @jax.jit
    def run_noemit(state, key):
        carry0 = F.pack_carry(world, state, fo, bp)

        def body(c, a):
            c2, _e = step(c, a)
            return c2, None

        carryT, _ = jax.lax.scan(
            body, carry0, make_act_rows(key), unroll=UNROLL
        )
        return carryT

    @jax.jit
    def run_noxs(state, key):
        carry0 = F.pack_carry(world, state, fo, bp)
        act = make_act_rows(key)[0]

        def body(c, _):
            return step(c, act)

        carryT, extras = jax.lax.scan(
            body, carry0, None, length=HORIZON, unroll=UNROLL
        )
        return carryT, extras

    @jax.jit
    def run_bare(state, key):
        carry0 = F.pack_carry(world, state, fo, bp)
        act = make_act_rows(key)[0]

        def body(c, _):
            c2, _e = step(c, act)
            return c2, None

        carryT, _ = jax.lax.scan(
            body, carry0, None, length=HORIZON, unroll=UNROLL
        )
        return carryT

    variants = {
        "full": run_full, "noemit": run_noemit,
        "noxs": run_noxs, "bare": run_bare,
    }
    key = jax.random.PRNGKey(0)
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = fn(env.state, key)
        jax.block_until_ready(out)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {n: float("inf") for n in variants}
    for g in range(GROUPS):
        for name, fn in variants.items():
            out = fn(env.state, jax.random.fold_in(key, g))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for r in range(REPS):
                out = fn(env.state, jax.random.fold_in(key, 10 * g + r))
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / (REPS * HORIZON)
            best[name] = min(best[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.2f} us/step", flush=True)

    print("\n=== rows scan split (us/step, best) ===")
    for n, v in best.items():
        print(f"{n:>7}: {v * 1e6:6.2f}")
    print(f"\nextras recording (full - noemit): "
          f"{(best['full'] - best['noemit']) * 1e6:+.2f}")
    print(f"xs slicing       (full - noxs):   "
          f"{(best['full'] - best['noxs']) * 1e6:+.2f}")
    print(f"both             (full - bare):   "
          f"{(best['full'] - best['bare']) * 1e6:+.2f}")
    print(f"bare kernel scan floor:           {best['bare'] * 1e6:.2f}")


if __name__ == "__main__":
    main()
