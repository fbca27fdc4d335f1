"""Count carry-relayout `copy` ops in a compiled rollout's scan body, and
optionally time the rollout at amortized dispatch.

The transport finding (round 4): ~10 copies of [B, E, 2]-class carries per
scan iteration were ~38 of the ~44 us/step — eliminated by the rows-carried
rollout. This tool asks the same question for any scenario/config before
investing in a rows-style restructure there.

Usage (on the chip; single process, one program per invocation):
  python tests/golden/time_scan_copies.py football 4096 --fused
  python tests/golden/time_scan_copies.py road_traffic 512 --time 500
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("scenario")
    p.add_argument("num_envs", type=int)
    p.add_argument("--fused", action="store_true")
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--time", type=int, default=0,
                   help="also time a rollout of this many steps")
    p.add_argument("--kw", nargs="*", default=[],
                   help="extra scenario kwargs as k=v (ints only)")
    args = p.parse_args()

    import jax

    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    kw = {}
    for item in args.kw:
        k, v = item.split("=")
        kw[k] = int(v)
    env = make_env(args.scenario, num_envs=args.num_envs, seed=0,
                   fused_physics=args.fused, **kw)
    fn = jax.jit(rollout_fn(env, horizon=args.horizon))
    compiled = fn.lower(env.state, env.steps, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()

    # the scan lowers to a while loop; its body computation contains the
    # per-step ops. Count copies and their shapes inside body computations.
    bodies = re.findall(
        r"%(?:while_body|body)[^{]*\{(.*?)\n\}", hlo, re.S
    ) or [hlo]
    copies = []
    for b in bodies:
        copies += re.findall(r"(\S+)\s*=\s*(\S+)\s+copy\(", b)
    shapes = [c[1] for c in copies]
    print(f"{args.scenario}@{args.num_envs} fused={args.fused}: "
          f"{len(copies)} copy ops in scan body")
    from collections import Counter
    for shape, n in Counter(shapes).most_common(12):
        print(f"  {n:3d} x {shape}")

    if args.time:
        fn_t = jax.jit(rollout_fn(env, horizon=args.time))
        out = fn_t(env.state, env.steps, jax.random.PRNGKey(0))
        jax.block_until_ready(out[2]["obs"][0])
        best = 1e9
        for w in range(4):
            t0 = time.perf_counter()
            out = fn_t(env.state, env.steps, jax.random.PRNGKey(w))
            jax.block_until_ready(out[2]["obs"][0])
            best = min(best, time.perf_counter() - t0)
        us = best * 1e6 / args.time
        print(f"  rollout: {us:.1f} us/step = "
              f"{args.num_envs * args.time / best / 1e6:.2f}M env-steps/s")


if __name__ == "__main__":
    sys.exit(main())
