"""Runtime validation helpers (checkify).

The reference guards correctness with pervasive eager shape/batch asserts
(reference core.py:223-283, environment.py:367-383) — impossible under jit,
where every assert must be functional. This module provides the TPU-native
analog (SURVEY.md §5 "race detection / sanitizers" row): a checkify-wrapped
step that turns NaN/Inf production anywhere in the compiled step into a
hard, locatable error instead of silent state corruption.

Usage::

    from vmas_tpu.debug import checked_step

    step = checked_step(env)          # compile once
    obs, rews, dones, infos = step(actions)   # raises on NaN / bad outputs

Scope: checkify's float_checks catch NaN production and division by zero at
the op that produced them; explicit isfinite invariants additionally catch
Inf (e.g. overflow) reaching the post-step state, observations or rewards.
Inf confined to intermediate scratch is not flagged. Intended for debugging
new scenarios/kernels; the check instrumentation costs throughput, so don't
leave it on in production rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["checked_step", "validate_state"]


def validate_state(state) -> None:
    """Functional invariant checks on a WorldState (adds checkify errors)."""
    checkify.check(jnp.isfinite(state.pos).all(), "non-finite entity positions")
    checkify.check(jnp.isfinite(state.vel).all(), "non-finite entity velocities")
    checkify.check(jnp.isfinite(state.rot).all(), "non-finite rotations")
    checkify.check(jnp.isfinite(state.ang_vel).all(), "non-finite angular velocities")


def checked_step(env):
    """A drop-in replacement for ``env.step`` that raises on NaN production
    anywhere in the compiled step (auto-inserted float checks) and on
    non-finite values reaching the post-step state, observations or
    rewards (explicit invariants)."""

    def _all_finite(tree):
        leaves = [
            l for l in jax.tree.leaves(tree)
            if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
        ]
        if not leaves:
            return jnp.asarray(True)
        return jnp.asarray([jnp.isfinite(l).all() for l in leaves]).all()

    def raw_step(state, steps, actions, key):
        out = env._step_fn_raw(state, steps, actions, key)
        validate_state(out[0])
        checkify.check(_all_finite(out[1]), "non-finite observations")
        checkify.check(_all_finite(out[2]), "non-finite rewards")
        return out

    checked = checkify.checkify(
        raw_step, errors=checkify.float_checks | checkify.user_checks
    )
    jitted = jax.jit(checked)

    def step(actions):
        actions = env._normalize_actions(actions)
        err, out = jitted(env.state, env.steps, tuple(actions), env._next_key())
        err.throw()
        (env.state, obs, rews, terminated, truncated, infos, env.steps) = out
        return env._pack_result(
            obs, rews, terminated, truncated, infos, True, True, True, True
        )

    return step
