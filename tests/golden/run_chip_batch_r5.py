#!/usr/bin/env python
"""One-claim chip batch for round 5's measurements (the axon tunnel claim
can take 15-30 min per process, so everything shares one process):

  1. rows-scan split (time_rows_split.main)
  2. football two-policy rows A/B + scripted-AI attribution
     (time_football_ab.main)
  3. road_traffic current-step timing @512 (VERDICT #6's honest number)

Run ON THE CHIP (no timeout wrap):
  nohup python tests/golden/run_chip_batch_r5.py > /tmp/chip_batch.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def road_traffic_point():
    import jax
    import jax.numpy as jnp

    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    print("\n=== road_traffic @512 (current step, honest rollout) ===",
          flush=True)
    env = make_env("road_traffic", num_envs=512, seed=0, fused_physics=True)
    run = jax.jit(rollout_fn(env, horizon=500))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    s, st, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    print(f"[compile] {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for w in range(4):
        t0 = time.perf_counter()
        s, st, traj = run(s, st, jax.random.fold_in(key, w))
        jax.block_until_ready(traj["rewards"])
        best = min(best, (time.perf_counter() - t0) / 500)
    print(f"road_traffic@512: {best * 1e6:.0f} us/step "
          f"({512 / best / 1e6:.2f}M env-steps/s)", flush=True)


def main():
    import time_football_ab
    import time_rows_split

    time_rows_split.main()
    time_football_ab.main()
    road_traffic_point()


if __name__ == "__main__":
    main()
