"""Same-process split of the transport bench step: the REAL fused physics
kernel (with emitted outputs) iterated alone in a scan, vs the full bench
rollout. The round-4 Mosaic calibration (time_mosaic_opcost.py) showed
synthetic kernels of the same op count and shape cost ~10-16 us, so if the
full step reads ~90-100 us the cost is NOT the kernel body — this harness
locates it.

Phases (each its own jitted scan, measured with multi-call windows so
program reloads amortize):

  rollout   the full bench rollout (rollout_fn, random actions, recording)
  kernel    scan of fused_physics_step(world, state, outputs) only —
            outputs consumed into the carry so nothing is dead-coded
  nostep    scan of state -> state with a trivial bump (scan floor)

Usage: python tests/golden/time_kernel_vs_rollout.py [B] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ITERS = 5


def scan_of(f):
    def run(state):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, state, None, length=N)[0]
    return jax.jit(run)


def measure(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    while time.time() - t0 < 5.0:
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / (N * ITERS))
    print(f"  {name:10s} {best*1e6:8.1f} us/step", flush=True)
    return best


def main():
    x = jnp.ones((128, 128))
    jax.block_until_ready(x @ x)
    print(f"probe ok; transport B={B} N={N}", flush=True)

    env = make_env("transport", num_envs=B, n_agents=4, seed=0, fused_physics=True)
    world = env.world
    fo = env._fused_outputs
    from vmas_tpu.core import fused as F

    run_roll = jax.jit(rollout_fn(env, horizon=N))
    key = jax.random.PRNGKey(0)
    st, steps, traj = run_roll(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])

    def kern(s):
        s2, extra = F.fused_physics_step(world, s, fo)
        # consume the output rows so they are not dead-coded
        return s2.replace(pos=s2.pos + jnp.sum(extra) * 0.0)

    def nostep(s):
        return s.replace(pos=s.pos + 1e-12)

    run_kern = scan_of(kern)
    run_nostep = scan_of(nostep)

    # measure rollout with the same window protocol
    out = run_roll(st, steps, key)
    jax.block_until_ready(out[2]["rewards"])
    t0 = time.time()
    while time.time() - t0 < 5.0:
        out = run_roll(st, steps, key)
        jax.block_until_ready(out[2]["rewards"])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = run_roll(st, steps, key)
        jax.block_until_ready(out[2]["rewards"])
        best = min(best, (time.perf_counter() - t0) / (N * ITERS))
    print(f"  {'rollout':10s} {best*1e6:8.1f} us/step", flush=True)

    measure("kernel", run_kern, st)
    measure("nostep", run_nostep, st)


if __name__ == "__main__":
    main()
