"""Scenario utilities.

Behavioral reference: /root/reference/vmas/simulator/utils.py:239-330
(ScenarioUtils). The unbounded rejection-sampling spawn loop becomes a
``lax.while_loop`` with masked per-env resampling — jit-traceable, identical
semantics (resample only envs that still overlap), bounded at 50k iterations
like the reference's warning threshold.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import jax
import jax.numpy as jnp

from vmas_tpu.core.state import WorldState
from vmas_tpu.core.utils import (  # noqa: F401  (re-exports for scenario authors)
    Color,
    JaxUtils,
    X,
    Y,
)

MAX_SPAWN_TRIES = 50_000


class ScenarioUtils:
    @staticmethod
    def find_random_pos_for_entity(
        occupied_positions: jnp.ndarray,  # [B, N, 2]
        key,
        world,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
    ):
        """[B, 1, 2] positions clear of all occupied positions
        (reference utils.py:271-319)."""
        B = occupied_positions.shape[0]

        def sample(k):
            kx, ky = jax.random.split(k)
            return jnp.stack(
                [
                    jax.random.uniform(kx, (B, 1), minval=x_bounds[0], maxval=x_bounds[1]),
                    jax.random.uniform(ky, (B, 1), minval=y_bounds[0], maxval=y_bounds[1]),
                ],
                axis=-1,
            )

        key, sub = jax.random.split(key)
        pos = sample(sub)
        if occupied_positions.shape[1] == 0:
            return pos

        def overlapping(p):
            dist = jnp.linalg.norm(occupied_positions - p, axis=-1)  # [B, N]
            return jnp.any(dist < min_dist_between_entities, axis=-1)  # [B]

        def cond(carry):
            _, pos, tries = carry
            return jnp.any(overlapping(pos)) & (tries < MAX_SPAWN_TRIES)

        def body(carry):
            key, pos, tries = carry
            key, sub = jax.random.split(key)
            proposed = sample(sub)
            pos = jnp.where(overlapping(pos)[:, None, None], proposed, pos)
            return key, pos, tries + 1

        _, pos, _ = jax.lax.while_loop(cond, body, (key, pos, 0))
        return pos

    @staticmethod
    def spawn_entities_randomly(
        entities,
        world,
        state: WorldState,
        key,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
        occupied_positions: jnp.ndarray = None,
    ) -> WorldState:
        """Sequential rejection-sampling spawn (reference utils.py:240-269).

        Functional signature: takes/returns the state and consumes a PRNG key;
        the reference's ``env_index`` is subsumed by the environment's reset
        mask blending.
        """
        B = state.batch_dim
        if occupied_positions is None:
            occupied_positions = jnp.zeros((B, 0, world.dim_p), jnp.float32)

        for entity in entities:
            key, sub = jax.random.split(key)
            pos = ScenarioUtils.find_random_pos_for_entity(
                occupied_positions, sub, world, min_dist_between_entities, x_bounds, y_bounds
            )
            occupied_positions = jnp.concatenate([occupied_positions, pos], axis=1)
            state = entity.set_pos(state, pos[:, 0])
        return state

    @staticmethod
    def check_kwargs_consumed(dictionary_of_kwargs: dict, warn: bool = True):
        if len(dictionary_of_kwargs) > 0:
            message = (
                f"Scenario kwargs: {dictionary_of_kwargs} passed but not used by the scenario."
            )
            if warn:
                warnings.warn(message + " This will turn into an error in future versions.")
            else:
                raise ValueError(message)
