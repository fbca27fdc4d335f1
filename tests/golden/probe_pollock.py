"""On-chip phase probe for pollock's XLA physics step (1024 envs).

Times: full rollout step, bare world.step, world.step with scatter-adds
replaced by one-hot MXU matmul accumulation, and with pair gathers replaced
by one-hot matmuls. Identifies which memory op class dominates.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env
from vmas_tpu.core import physics as P

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NAME = sys.argv[2] if len(sys.argv) > 2 else "pollock"


def timeit(fn, state, n=30):
    state = fn(state)
    jax.block_until_ready(state.pos)
    # ramp
    t0 = time.time()
    while time.time() - t0 < 5.0:
        state = fn(state)
        jax.block_until_ready(state.pos)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        s = state
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(s.pos)
        best = min(best, (time.time() - t0) / n)
    return best


env = make_env(NAME, num_envs=B, seed=0)
world = env.world
state0 = env.state

step = jax.jit(lambda s: P.physics_step(world, s))
t_base = timeit(step, state0)
print(f"base physics_step      {t_base*1e6:9.0f} us", flush=True)

# --- variant: one-hot matmul accumulation instead of scatter-add ---------
E = len(world.spec.mass)
orig_add_force, orig_add_torque = P._add_force, P._add_torque


def _oh(idx):
    m = np.zeros((E, len(idx)), np.float32)
    m[np.asarray(idx), np.arange(len(idx))] = 1.0
    return jnp.asarray(m)


def mm_add_force(forces, spec, idx, f):
    mv = jnp.asarray(spec.movable[idx], bool)
    fm = jnp.where(mv[None, :, None], f, 0.0)
    return forces + jnp.einsum(
        "ep,bpd->bed", _oh(idx), fm, precision=jax.lax.Precision.HIGHEST
    )


def mm_add_torque(torques, spec, idx, t):
    ro = jnp.asarray(spec.rotatable[idx], bool)
    tm = jnp.where(ro[None, :], t, 0.0)
    return torques + jnp.einsum(
        "ep,bp->be", _oh(idx), tm, precision=jax.lax.Precision.HIGHEST
    )


P._add_force, P._add_torque = mm_add_force, mm_add_torque
step_mm = jax.jit(lambda s: P.physics_step(world, s))
t_mm = timeit(step_mm, state0)
print(f"matmul scatter         {t_mm*1e6:9.0f} us", flush=True)
P._add_force, P._add_torque = orig_add_force, orig_add_torque

# --- sanity: matmul-scatter numerics vs base -----------------------------
a = step(state0)
b = step_mm(state0)
err = jnp.max(jnp.abs(a.pos - b.pos))
print(f"pos err base vs matmul {float(err):.3e}", flush=True)
