"""Standalone timing: road_traffic pallas sweep kernel vs XLA path on TPU.

Usage: python tests/golden/time_rt_kernel.py [kernel|xla|both] [B]
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn

HORIZON = 100


def time_step(use_kernel):
    env = make_env(
        "road_traffic", num_envs=B, seed=0, pallas_sweeps=use_kernel,
    )
    run = jax.jit(rollout_fn(env, horizon=HORIZON))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    # ramp clock with sustained load
    t0 = time.time()
    while time.time() - t0 < 12.0:
        state, steps, traj = run(state, steps, jax.random.fold_in(key, 1))
        jax.block_until_ready(traj["rewards"])
    # timed windows
    best = float("inf")
    for w in range(3):
        t0 = time.time()
        N = 5
        for i in range(N):
            state, steps, traj = run(state, steps, jax.random.fold_in(key, 10 * w + i))
        jax.block_until_ready(traj["rewards"])
        best = min(best, (time.time() - t0) / (N * HORIZON))
    print(f"  {best*1e6:.0f} us/step  ({B/best/1e6:.2f}M env-steps/s)", flush=True)
    return best


if mode in ("kernel", "both"):
    print("pallas_sweeps=True:", flush=True)
    time_step(True)
if mode in ("xla", "both"):
    print("pallas_sweeps=False:", flush=True)
    time_step(False)
