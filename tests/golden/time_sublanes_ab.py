"""Same-process A/B of VMAS_TPU_FUSED_SUBLANES (fused-kernel sublane
packing) on TPU, through the real bench rollout (fused physics + fused
outputs, obs kept in the scan).

The flag is read at kernel build (jit trace) time, so one process can build
both variants and interleave their windows — the only decision-grade
comparison through the axon tunnel (docs/PERFORMANCE.md).

Usage: python tests/golden/time_sublanes_ab.py [scenario] [B] [S_a S_b ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

SCEN = sys.argv[1] if len(sys.argv) > 1 else "transport"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
SVALS = sys.argv[3:] or ["1", "8"]
HORIZON = 100
KW = {"transport": dict(n_agents=4), "football": {}}.get(SCEN, {})


def build(s):
    os.environ["VMAS_TPU_FUSED_SUBLANES"] = s
    from vmas_tpu import make_env
    from vmas_tpu.parallel.rollout import rollout_fn

    env = make_env(SCEN, num_envs=B, seed=0, fused_physics=True, **KW)
    run = jax.jit(rollout_fn(env, horizon=HORIZON))
    key = jax.random.PRNGKey(0)
    st, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    return [run, st, steps, key]


def time_one(v, w):
    t0 = time.perf_counter()
    st, steps, traj = v[0](v[1], v[2], jax.random.fold_in(v[3], w))
    jax.block_until_ready(traj["rewards"])
    v[1], v[2] = st, steps
    return (time.perf_counter() - t0) / HORIZON


def main():
    x = jax.numpy.ones((128, 128))
    jax.block_until_ready(x @ x)
    print(f"probe ok on {jax.devices()[0].platform}", flush=True)

    variants = {}
    for s in SVALS:
        variants[s] = build(s)
        print(f"built S={s}", flush=True)
    for _ in range(3):
        for v in variants.values():
            time_one(v, 0)
    best = {s: float("inf") for s in SVALS}
    for w in range(6):
        line = f"  window {w}:"
        for s, v in variants.items():
            t = time_one(v, w)
            best[s] = min(best[s], t)
            line += f"  S={s} {t*1e6:8.1f}"
        print(line + " us/step", flush=True)
    print("BEST " + f"{SCEN}@{B}: " + "  ".join(
        f"S={s} {best[s]*1e6:.1f}" for s in SVALS) + " us/step")


if __name__ == "__main__":
    print(f"sublane-packing A/B  {SCEN}  B={B}  S={SVALS}  horizon={HORIZON}",
          flush=True)
    main()
