"""Same-process A/B of VMAS_TPU_BATCH_DYNAMICS (agent-axis grouped
process_action) on TPU, through the real rollout harness.

The flag is read at Environment build time, so one process can build both
variants and interleave their measurements — the only decision-grade
comparison through the axon tunnel (docs/PERFORMANCE.md, measurement
discipline).

Usage: python tests/golden/time_batch_dyn_ab.py [scenario] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

SCEN = sys.argv[1] if len(sys.argv) > 1 else "road_traffic"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
HORIZON = 50
KW = {
    "road_traffic": dict(is_add_noise=False),
    "kinematic_bicycle": {},
    "diff_drive": {},
}.get(SCEN, {})


def build(flag):
    os.environ["VMAS_TPU_BATCH_DYNAMICS"] = flag
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    env = make_env(SCEN, num_envs=B, seed=0, **KW)
    run = jax.jit(rollout_fn(env, horizon=HORIZON))
    key = jax.random.PRNGKey(0)
    st, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    return run, st, steps, key


def time_one(run, st, steps, key, w):
    t0 = time.perf_counter()
    st, steps, traj = run(st, steps, jax.random.fold_in(key, w))
    jax.block_until_ready(traj["rewards"])
    return (time.perf_counter() - t0) / HORIZON, st, steps


def main():
    # tiny matmul probe first (tunnel discipline)
    x = jax.numpy.ones((128, 128))
    jax.block_until_ready(x @ x)
    print(f"probe ok on {jax.devices()[0].platform}", flush=True)

    a = build("0")
    b = build("1")
    # warm both
    for _ in range(3):
        _, a1, a2 = time_one(a[0], a[1], a[2], a[3], 0)
        _, b1, b2 = time_one(b[0], b[1], b[2], b[3], 0)
        a = (a[0], a1, a2, a[3])
        b = (b[0], b1, b2, b[3])
    best_a = best_b = float("inf")
    for w in range(6):
        ta, a1, a2 = time_one(a[0], a[1], a[2], a[3], w)
        tb, b1, b2 = time_one(b[0], b[1], b[2], b[3], w)
        a = (a[0], a1, a2, a[3])
        b = (b[0], b1, b2, b[3])
        best_a, best_b = min(best_a, ta), min(best_b, tb)
        print(f"  window {w}: per-agent {ta*1e6:8.1f}  batched {tb*1e6:8.1f} us/step", flush=True)
    print(f"BEST {SCEN}@{B}: per-agent {best_a*1e6:.1f}  batched {best_b*1e6:.1f} us/step "
          f"({best_a/best_b:.2f}x)")


if __name__ == "__main__":
    print(f"batch-dynamics A/B  {SCEN}  B={B}  horizon={HORIZON}", flush=True)
    main()
