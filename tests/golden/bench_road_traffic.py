"""road_traffic step-time: global polyline sweep vs windowed search.

Run on the real TPU:  python tests/golden/bench_road_traffic.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn


def bench(B, window, horizon=20, reps=5, **kw):
    env = make_env("road_traffic", num_envs=B, seed=0, search_window=window,
                   is_add_noise=False, **kw)
    run = jax.jit(rollout_fn(env, horizon=horizon))
    key = jax.random.PRNGKey(0)
    state, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
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
    tag = f"W={window}" if window else "global"
    print(f"road_traffic B={B} {tag:>6}: {best * 1e6:9.1f} us/step "
          f"({B / best / 1e6:5.2f}M env-steps/s)")
    return best


if __name__ == "__main__":
    for B in (512,):
        g = bench(B, 0)
        for W in (16, 32, 64):
            w = bench(B, W)
            print(f"  -> W={W}: {g / w:.2f}x faster than global")
