"""Validate + benchmark the lane-batched fused-pair formulation on the chip.

Run on the real TPU (no platform override):
  python tests/golden/bench_fused_v2.py [--quick]

1. parity: fused vs XLA trajectories on worlds that trigger the batched
   branches (ss / ls / bs / bl / bb tiles)
2. speed: full-env-step rollout us/step, XLA vs fused, football 512/4096
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env
from vmas_tpu.core import fused


def _randomized(env, key):
    st = env.state
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return st.replace(
        pos=st.pos + jax.random.normal(k1, st.pos.shape) * 0.05,
        vel=jax.random.normal(k2, st.vel.shape) * 0.3,
        ang_vel=st.ang_vel + jax.random.normal(k3, st.ang_vel.shape) * 0.2,
        force=jax.random.normal(k4, st.force.shape) * 0.5,
        torque=jax.random.normal(k4, st.torque.shape) * 0.2,
    )


def compare(name, B=7, steps=4, **kw):
    er = make_env(name, num_envs=B, seed=3, **kw)
    ef = make_env(name, num_envs=B, seed=3, **kw)
    ef.world.fused = True
    assert fused.supports(ef.world), f"{name}: unsupported"
    spec = er.world.spec
    counts = {t: len(getattr(spec, a)) for t, a in [
        ("ss", "ss_a"), ("ls", "ls_line"), ("ll", "ll_a"),
        ("bs", "bs_box"), ("bl", "bl_box"), ("bb", "bb_a")]}
    batched = [t for t, n in counts.items() if n >= fused._lane_min()]
    sr = jax.jit(er.world.step)
    sf = jax.jit(ef.world.step)
    ref = fus = _randomized(er, jax.random.PRNGKey(42))
    worst = 0.0
    for t in range(steps):
        ref = sr(ref)
        fus = sf(fus)
        for f in ("pos", "vel", "rot", "ang_vel"):
            err = float(jnp.max(jnp.abs(getattr(ref, f) - getattr(fus, f))))
            worst = max(worst, err)
    print(f"parity {name:<24} pairs={counts} batched={batched} max_err={worst:.2e}")
    assert worst < 5e-5, f"{name}: fused diverged ({worst})"


def bench(name, B, fused_on, horizon=50, reps=5, **kw):
    from vmas_tpu.parallel.rollout import rollout_fn

    env = make_env(name, num_envs=B, seed=0, fused_physics=fused_on, **kw)
    if fused_on:
        assert fused.supports(env.world), f"{name}: fused unsupported"
    run = jax.jit(rollout_fn(env, horizon=horizon))
    key = jax.random.PRNGKey(0)
    state, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    # ramp the device clock until per-run time stabilizes (bench.py protocol;
    # cold-clock numbers read 2x+ slow)
    prev = float("inf")
    for w in range(25):
        t0 = time.perf_counter()
        state, steps, traj = run(state, steps, jax.random.fold_in(key, 100 + w))
        jax.block_until_ready(traj["rewards"])
        cur = time.perf_counter() - t0
        if w >= 4 and cur > 0.9 * prev:
            break
        prev = min(prev, cur)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        state, steps, traj = run(state, steps, jax.random.fold_in(key, r))
        jax.block_until_ready(traj["rewards"])
        best = min(best, (time.perf_counter() - t0) / horizon)
    tag = "fused" if fused_on else "xla  "
    print(f"bench  {name} B={B} {tag}: {best * 1e6:8.1f} us/step "
          f"({B / best / 1e6:6.2f}M env-steps/s)")
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--skip-parity", action="store_true")
    args = p.parse_args()

    if not args.skip_parity:
        # NOTE dispersion is useless here: all its entities are collide=False
        # (zero pairs). football covers the ss tile (21 pairs).
        compare("pollock", n_agents=4, n_lines=4, n_boxes=4)  # batched ls/bs/bl + unrolled ll/bb
        compare("pollock", n_agents=4, n_lines=6, n_boxes=6)  # ALL SIX tile branches (ll 15, bb 15)
        compare("football", B=5, n_blue_agents=3, n_red_agents=3,
                ai_red_agents=False, ai_blue_agents=False, dense_reward=True)
        compare("transport", n_agents=3)             # unrolled control case

    if not args.quick:
        for B in (512, 4096):
            kw = dict(ai_red_agents=True)
            x = bench("football", B, False, **kw)
            f = bench("football", B, True, **kw)
            print(f"  -> football B={B}: fused/xla = {f / x:.2f}x "
                  f"({'WIN' if f < x else 'LOSS'})")
        bench("transport", 4096, True, n_agents=4)
