"""On-chip rows-rollout equivalence battery.

The CPU test suite proves the rows paths replay the standard rollout in
interpret mode (small FMA-contraction tolerances); this script runs the
same comparison ON THE REAL CHIP, where both paths execute the identical
Mosaic-compiled kernel, and prints max|diff| per field — the round-4
records (docs/PERFORMANCE.md) cite transport+passage at exactly 0.0.

One scenario per invocation (two compiled programs per comparison — keep
the process small):
  python tests/golden/tpu_verify_rows.py transport
  python tests/golden/tpu_verify_rows.py simple_spread --discrete
  python tests/golden/tpu_verify_rows.py ball_passage
  python tests/golden/tpu_verify_rows.py simple_reference
  # round-5 eligibility classes:
  python tests/golden/tpu_verify_rows.py give_way            # PID in-kernel
  python tests/golden/tpu_verify_rows.py flocking            # script + clock rows
  python tests/golden/tpu_verify_rows.py football --kw ai_red_agents=0
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scenario")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--discrete", action="store_true")
    p.add_argument("--kw", nargs="*", default=[], help="k=v ints")
    args = p.parse_args()

    import jax
    import numpy as np

    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import (
        rollout_fn,
        rows_rollout_fn,
        rows_rollout_supported,
    )

    kw = {k: int(v) for k, v in (s.split("=") for s in args.kw)}
    if args.discrete:
        kw["continuous_actions"] = False
    env_a = make_env(args.scenario, num_envs=args.num_envs, seed=0,
                     fused_physics=True, **kw)
    env_b = make_env(args.scenario, num_envs=args.num_envs, seed=0,
                     fused_physics=True, **kw)
    assert rows_rollout_supported(env_b), "not rows-eligible"
    key = jax.random.PRNGKey(7)
    s1, t1, tr1 = jax.jit(rollout_fn(env_a, horizon=args.horizon))(
        env_a.state, env_a.steps, key
    )
    s2, t2, tr2 = jax.jit(rows_rollout_fn(env_b, horizon=args.horizon))(
        env_b.state, env_b.steps, key
    )

    def d(a, b):
        return float(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32)).max())

    obs_d = max(d(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(tr1["obs"]),
        jax.tree_util.tree_leaves(tr2["obs"])))
    print(f"{args.scenario}@{args.num_envs} x{args.horizon} on "
          f"{jax.devices()[0].platform}: "
          f"obs {obs_d:.3g} rew {d(tr1['rewards'], tr2['rewards']):.3g} "
          f"done {d(tr1['dones'], tr2['dones']):.3g} "
          f"pos {d(s1.pos, s2.pos):.3g} rot {d(s1.rot, s2.rot):.3g} "
          f"vel {d(s1.vel, s2.vel):.3g}")


if __name__ == "__main__":
    sys.exit(main())
