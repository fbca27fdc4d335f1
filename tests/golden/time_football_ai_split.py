#!/usr/bin/env python
"""Split the scripted AI's ~103 us/step (time_football_ab.py): how much is
check_better_positions (candidate sampling + position values) vs the rest
(possession, dribble geometry, hermite control, ai-scratch carry)?

  ai      default config (scripted red AI on)
  noobj   ai_forced_objectives=True — dribble_policy reads the recorded/
          injected objective instead of sampling+valuing candidates (the
          parity harness's mode); program = default minus
          check_better_positions
  aistub  red scripts replaced by constant u (the floor from
          time_football_ab.py, repeated here for same-session deltas)

Run ON THE CHIP: nohup python tests/golden/time_football_ai_split.py > /tmp/fai.log 2>&1 &
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


def main():
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    key = jax.random.PRNGKey(0)

    env_ai = make_env("football", num_envs=NUM_ENVS, seed=0,
                      fused_physics=True)
    env_no = make_env("football", num_envs=NUM_ENVS, seed=0,
                      fused_physics=True, ai_forced_objectives=True)
    env_st = make_env("football", num_envs=NUM_ENVS, seed=0,
                      fused_physics=True)
    for a in env_st.scenario.red_agents:
        a.action_script = lambda agent, world, state: agent.set_u(
            state, jnp.full((state.batch_dim, agent.action_size), 0.01)
        )

    variants = {
        "ai": (jax.jit(rollout_fn(env_ai, horizon=HORIZON)), env_ai),
        "noobj": (jax.jit(rollout_fn(env_no, horizon=HORIZON)), env_no),
        "aistub": (jax.jit(rollout_fn(env_st, horizon=HORIZON)), env_st),
    }
    for name, (fn, e) in variants.items():
        t0 = time.perf_counter()
        out = fn(e.state, e.steps, key)
        jax.block_until_ready(out[2]["rewards"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {n: float("inf") for n in variants}
    for g in range(GROUPS):
        for name, (fn, e) in variants.items():
            s, st, traj = fn(e.state, e.steps, jax.random.fold_in(key, g))
            jax.block_until_ready(traj["rewards"])
            t0 = time.perf_counter()
            for r in range(REPS):
                s, st, traj = fn(s, st, jax.random.fold_in(key, 10 * g + r))
            jax.block_until_ready(traj["rewards"])
            dt = (time.perf_counter() - t0) / (REPS * HORIZON)
            best[name] = min(best[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.1f} us/step", flush=True)

    print("\n=== football AI split (us/step, best) ===")
    for n, v in best.items():
        print(f"{n:>7}: {v * 1e6:6.1f}")
    print(f"check_better_positions (ai - noobj): "
          f"{(best['ai'] - best['noobj']) * 1e6:+.1f}")
    print(f"rest of the AI (noobj - aistub):     "
          f"{(best['noobj'] - best['aistub']) * 1e6:+.1f}")


if __name__ == "__main__":
    main()
