#!/usr/bin/env python
"""Bisect check_better_positions' ~100 us/step (time_football_ai_split.py):
sampling+scatter vs get_pos_value vs clamp/argmax/gather. Monkeypatched
variants of the SAME env config, same-process grouped A/B.

Run ON THE CHIP: nohup python tests/golden/time_football_cbp.py > /tmp/fcbp.log 2>&1 &
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


def build(patch):
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    env = make_env("football", num_envs=NUM_ENVS, seed=0, fused_physics=True)
    ctrl = env.scenario.red_controller
    patch(ctrl)
    return jax.jit(rollout_fn(env, horizon=HORIZON)), env


def main():
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    key = jax.random.PRNGKey(0)

    def no_patch(ctrl):
        pass

    def novalue(ctrl):
        # constant position values -> argmax picks candidate 0; keeps the
        # sampling + clamp + gather structure
        ctrl.get_pos_value = lambda state, ai, pos, agent: pos[..., 0] * 0.0

    def nocbp(ctrl):
        # drop the whole candidate machinery: reposition to the current
        # target (reads the same scratch, zero extra compute)
        def cbp(state, ai, agent):
            i = ctrl.slot_in_team(agent)
            return ai["target_pos_rel"][:, i] + ctrl.scenario.ball.pos(state)

        ctrl.check_better_positions = cbp

    def noclamp(ctrl):
        ctrl.clamp_pos = lambda pos: pos

    variants = {}
    for name, patch in [("ai", no_patch), ("novalue", novalue),
                        ("noclamp", noclamp), ("nocbp", nocbp)]:
        fn, env = build(patch)
        t0 = time.perf_counter()
        out = fn(env.state, env.steps, key)
        jax.block_until_ready(out[2]["rewards"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        variants[name] = (fn, env)

    best = {n: float("inf") for n in variants}
    for g in range(GROUPS):
        for name, (fn, env) in variants.items():
            s, st, traj = fn(env.state, env.steps, jax.random.fold_in(key, g))
            jax.block_until_ready(traj["rewards"])
            t0 = time.perf_counter()
            for r in range(REPS):
                s, st, traj = fn(s, st, jax.random.fold_in(key, 10 * g + r))
            jax.block_until_ready(traj["rewards"])
            dt = (time.perf_counter() - t0) / (REPS * HORIZON)
            best[name] = min(best[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.1f} us/step", flush=True)

    print("\n=== check_better_positions bisect (us/step, best) ===")
    for n, v in best.items():
        print(f"{n:>8}: {v * 1e6:6.1f}")
    print(f"value fn  (ai - novalue): {(best['ai'] - best['novalue']) * 1e6:+.1f}")
    print(f"clamp     (ai - noclamp): {(best['ai'] - best['noclamp']) * 1e6:+.1f}")
    print(f"whole cbp (ai - nocbp):   {(best['ai'] - best['nocbp']) * 1e6:+.1f}")


if __name__ == "__main__":
    main()
