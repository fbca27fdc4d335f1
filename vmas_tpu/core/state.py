"""The world state pytree.

This replaces the reference's per-entity ``EntityState``/``AgentState``
objects (reference core.py:205-409) with one struct-of-arrays pytree: every
quantity is a single ``[B, E, ...]`` array over all entities, so the whole
simulation step is a handful of fused XLA ops instead of Python loops.

Partial reset (`reset_at`, reference environment.py:131-148) is expressed as a
pytree blend with a ``[B]`` boolean mask — see ``blend``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class WorldState:
    # Rigid-body state, [B, E, ...]; rotations are trailing-scalar.
    pos: jnp.ndarray  # [B, E, 2]
    vel: jnp.ndarray  # [B, E, 2]
    rot: jnp.ndarray  # [B, E]
    ang_vel: jnp.ndarray  # [B, E]
    # Persistent per-entity action force/torque (AgentState.force/torque,
    # reference core.py:345-373); only agent rows are ever written.
    force: jnp.ndarray  # [B, E, 2]
    torque: jnp.ndarray  # [B, E]
    # Communication state and per-agent actions.
    c: jnp.ndarray  # [B, A, dim_c] (dim_c may be 0)
    u: Tuple[jnp.ndarray, ...]  # per-agent [B, action_size_i]
    uc: jnp.ndarray  # [B, A, dim_c] comm actions
    # Per-agent dynamics hidden state (e.g. Drone's 12-dim 3D state).
    dyn: Tuple[Any, ...]
    # Per-joint-constraint fixed rotation values [B, J] (dynamic for dist>0
    # joints with rotate=False, reference joints.py:139-143).
    joint_fixed_rot: jnp.ndarray
    # [B, E] per-env rendering mask (Entity.is_rendering, core.py:611-618).
    rendering: jnp.ndarray
    # Scenario scratch (shaping baselines, eaten flags, controller state, ...).
    scenario: Dict[str, Any]
    # Optional per-env per-entity gravity override [B, E, 2] (None unless the
    # world was built with dynamic_gravity=True; used by e.g. wind_flocking's
    # per-env wind field, reference wind_flocking.py:143-148, 356-370).
    dyn_gravity: Any = None

    @property
    def batch_dim(self) -> int:
        return self.pos.shape[0]

    @property
    def n_entities(self) -> int:
        return self.pos.shape[1]


def blend(mask: jnp.ndarray, new_state: WorldState, old_state: WorldState) -> WorldState:
    """Select ``new_state`` where ``mask`` ([B] bool) else ``old_state``.

    This is the vectorized generalization of the reference's
    ``TorchUtils.where_from_index`` masked writes (utils.py:233-236): a full
    reset is ``mask=ones``, ``reset_at(i)`` is a one-hot mask, and done-driven
    auto-resets are the done vector — all hitting the same compiled code.
    """

    def _sel(new, old):
        # Leaves without a leading env axis (e.g. PRNG keys in scenario
        # scratch) can't be masked per-env; the fresh value wins.
        if new.ndim == 0 or new.shape[0] != mask.shape[0]:
            return new
        m = mask.reshape(mask.shape + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(_sel, new_state, old_state)
