"""road_traffic step-time benchmark.

Run on the real TPU:  python tests/golden/bench_road_traffic.py
History: the windowed-search variant this script once compared was measured
slower than the dense sweep (TPU element gathers ~20 GB/s) and removed; see
docs/PERFORMANCE.md "road_traffic" notes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn


def bench(B, horizon=20, reps=5, **kw):
    env = make_env("road_traffic", num_envs=B, seed=0, is_add_noise=False, **kw)
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
    print(f"road_traffic B={B}: {best * 1e6:9.1f} us/step "
          f"({B / best / 1e6:5.2f}M env-steps/s)")
    return best


if __name__ == "__main__":
    for B in (512, 2048):
        bench(B)
