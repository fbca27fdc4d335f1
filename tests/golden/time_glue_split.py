"""Same-process split of the transport bench rollout's ~38 us/step XLA glue
(everything around the ~6 us fused kernel; see time_kernel_vs_rollout.py).

Variants, each a 500-step jitted scan, multi-call windows:

  full      rollout_fn (decode + kernel + obs/rew assembly + recording)
  norec     same body via env._step_fn_raw but recording NOTHING (XLA
            dead-codes the unpack/obs assembly that nothing consumes)
  rewonly   record rewards + dones only (obs assembly dead-coded)
  kernel    fused_physics_step alone (floor)

(A planned `rawrows` variant — record the raw fused-output rows — was
superseded by the rows-carried rollout itself, which IS that structure;
measure it via bench.py / parallel.rows_rollout_fn instead.)

Usage: python tests/golden/time_glue_split.py [B] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import rollout_fn, _random_actions_for_horizon

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 500
ITERS = 3


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
    print(f"  {name:8s} {best*1e6:8.1f} us/step", flush=True)
    return best


def main():
    jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(f"probe ok; transport B={B} N={N}", flush=True)

    env = make_env("transport", num_envs=B, n_agents=4, seed=0, fused_physics=True)
    key = jax.random.PRNGKey(0)

    run_full = jax.jit(rollout_fn(env, horizon=N))
    st0, steps0, traj = run_full(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])

    def body_of(record):
        def run(state, steps, k):
            k_pol, k_step = jax.random.split(k)
            acts = _random_actions_for_horizon(env, k_pol, N)
            step_keys = jax.random.split(k_step, N)

            def body(carry, xs):
                state, steps = carry
                a_t, kk = xs
                state, obs, rews, term, trunc, infos, steps = env._step_fn_raw(
                    state, steps, tuple(a_t), kk
                )
                return (state, steps), record(obs, rews, term | trunc)

            (state, steps), ys = jax.lax.scan(
                body, (state, steps), (acts, step_keys)
            )
            return state, steps, ys
        return jax.jit(run)

    run_norec = body_of(lambda obs, rews, done: ())
    run_rew = body_of(lambda obs, rews, done: (jnp.stack(rews, -1), done))

    from vmas_tpu.core import fused as F
    world, fo = env.world, env._fused_outputs

    def run_kernel_scan(state):
        def body(s, _):
            s2, extra = F.fused_physics_step(world, s, fo)
            return s2.replace(pos=s2.pos + jnp.sum(extra) * 0.0), ()
        return jax.lax.scan(body, state, None, length=N)[0]

    run_kernel = jax.jit(run_kernel_scan)

    measure("full", run_full, st0, steps0, key)
    measure("norec", run_norec, st0, steps0, key)
    measure("rewonly", run_rew, st0, steps0, key)
    measure("kernel", run_kernel, st0)


if __name__ == "__main__":
    main()
