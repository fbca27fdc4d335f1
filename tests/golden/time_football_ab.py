#!/usr/bin/env python
"""Football throughput attribution (VERDICT r4 weak #5 / next #4).

Same-process grouped A/Bs at 500-step calls:

  two-policy config (the trainable config):
    std    rollout_fn (fused physics, hook pipeline rollout)
    rows   rows_rollout_fn (round 5: ball script in-kernel, red mirror as
           decode transform) — the before/after for the rows upgrade
  scripted-AI config (default):
    ai     rollout_fn with the scripted red AI on
    aistub red agents' scripts stubbed to constant u (same program shape
           minus the AI's XLA geometry) — isolates the AI's cost from the
           kernel + obs assembly

Run ON THE CHIP (no timeout wrap):
  nohup python tests/golden/time_football_ab.py > /tmp/football_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

NUM_ENVS = 4096
HORIZON = 500
REPS = 2
GROUPS = 2


def bench(variants, key, state_steps):
    best = {n: float("inf") for n in variants}
    for name, (fn, st) in variants.items():
        t0 = time.perf_counter()
        out = fn(st[0], st[1], key)
        jax.block_until_ready(out[2]["rewards"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    for g in range(GROUPS):
        for name, (fn, st) in variants.items():
            s, stp, traj = fn(st[0], st[1], jax.random.fold_in(key, g))
            jax.block_until_ready(traj["rewards"])
            t0 = time.perf_counter()
            for r in range(REPS):
                s, stp, traj = fn(s, stp, jax.random.fold_in(key, 10 * g + r))
            jax.block_until_ready(traj["rewards"])
            dt = (time.perf_counter() - t0) / (REPS * HORIZON)
            best[name] = min(best[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.1f} us/step "
                  f"({NUM_ENVS / dt / 1e6:.1f}M env-steps/s)", flush=True)
    return best


def main():
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import (
        rollout_fn, rows_rollout_fn, rows_rollout_supported,
    )

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    key = jax.random.PRNGKey(0)

    print("=== two-policy config (ai_red_agents=False) ===", flush=True)
    env_a = make_env("football", num_envs=NUM_ENVS, seed=0,
                     fused_physics=True, ai_red_agents=False)
    env_b = make_env("football", num_envs=NUM_ENVS, seed=0,
                     fused_physics=True, ai_red_agents=False)
    assert rows_rollout_supported(env_b)
    best = bench(
        {
            "std": (jax.jit(rollout_fn(env_a, horizon=HORIZON)),
                    (env_a.state, env_a.steps)),
            "rows": (jax.jit(rows_rollout_fn(env_b, horizon=HORIZON)),
                     (env_b.state, env_b.steps)),
        },
        key, None,
    )
    print(f"rows speedup: {best['std'] / best['rows']:.2f}x", flush=True)

    print("\n=== scripted-AI config (default) ===", flush=True)
    env_ai = make_env("football", num_envs=NUM_ENVS, seed=0,
                      fused_physics=True)
    env_st = make_env("football", num_envs=NUM_ENVS, seed=0,
                      fused_physics=True)
    for a in env_st.scenario.red_agents:
        a.action_script = lambda agent, world, state: agent.set_u(
            state, jnp.full((state.batch_dim, agent.action_size), 0.01)
        )
    best = bench(
        {
            "ai": (jax.jit(rollout_fn(env_ai, horizon=HORIZON)),
                   (env_ai.state, env_ai.steps)),
            "aistub": (jax.jit(rollout_fn(env_st, horizon=HORIZON)),
                       (env_st.state, env_st.steps)),
        },
        key, None,
    )
    print(f"scripted AI cost: "
          f"{(best['ai'] - best['aistub']) * 1e6:+.1f} us/step "
          f"of {best['ai'] * 1e6:.1f}", flush=True)


if __name__ == "__main__":
    main()
