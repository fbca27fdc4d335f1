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
    def find_random_pos_for_entity_vectorized(
        occupied_positions: jnp.ndarray,  # [B, N, 2]
        key,
        world,
        min_dist_between_entities: float,
        x_bounds: Tuple[float, float],
        y_bounds: Tuple[float, float],
        n_candidates: int = 8,
    ):
        """[B, 1, 2] like :func:`find_random_pos_for_entity`, but draws
        ``n_candidates`` proposals in one batch and keeps the first clear one
        instead of a serialized rejection ``while_loop`` — the right choice
        inside per-step hooks (e.g. covered-target respawn), where a
        while_loop would serialize the whole step. Falls back to the first
        candidate when all overlap (argmax over an all-False mask picks
        index 0; the reference also gives up after enough tries,
        utils.py:301-316)."""
        B = occupied_positions.shape[0]
        kx, ky = jax.random.split(key)
        cands = jnp.stack(
            [
                jax.random.uniform(kx, (B, n_candidates), minval=x_bounds[0], maxval=x_bounds[1]),
                jax.random.uniform(ky, (B, n_candidates), minval=y_bounds[0], maxval=y_bounds[1]),
            ],
            axis=-1,
        )  # [B, K, 2]
        if occupied_positions.shape[1] == 0:
            return cands[:, :1]
        dist = jnp.linalg.norm(
            occupied_positions[:, None] - cands[:, :, None], axis=-1
        )  # [B, K, N]
        ok = jnp.all(dist >= min_dist_between_entities, axis=-1)  # [B, K]
        # first clear candidate; if none, argmax returns 0 — best-effort
        first = jnp.argmax(ok, axis=-1)
        pick = jnp.take_along_axis(cands, first[:, None, None], axis=1)
        return pick

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


def extract_nested_with_index(data, index: int):
    """Index an array or a (nested) dict of arrays at ``index`` along the
    leading (env) axis (reference utils.py:155-163)."""
    if isinstance(data, dict):
        return {key: extract_nested_with_index(value, index) for key, value in data.items()}
    return data[index]


def x_to_rgb_colormap(
    x,
    low: float = None,
    high: float = None,
    alpha: float = 1.0,
    cmap_name: str = "viridis",
    cmap_res: int = 10,
):
    """Map scalar field values to RGBA rows through a ``cmap_res``-entry
    colormap with linear interpolation between adjacent entries (reference
    utils.py:127-152). Host-side numpy — a rendering helper, not a traced op.

    Returns ``[N, 4]`` float rows in [0, 1]."""
    import numpy as np
    from matplotlib import colormaps

    colormap = colormaps[cmap_name].resampled(cmap_res)(range(cmap_res))[:, :-1]
    x = np.asarray(x, dtype=np.float64)
    if low is None:
        low = np.min(x)
    if high is None:
        high = np.max(x)
    x = np.clip(x, low, high)
    if high - low > 1e-5:
        x = (x - low) / (high - low) * (cmap_res - 1)
    x_c0_idx = np.floor(x).astype(int)
    x_c1_idx = np.ceil(x).astype(int)
    x_c0 = colormap[x_c0_idx, :]
    x_c1 = colormap[x_c1_idx, :]
    t = x - x_c0_idx
    rgb = t[:, None] * x_c1 + (1 - t)[:, None] * x_c0
    return np.concatenate([rgb, alpha * np.ones((rgb.shape[0], 1))], axis=-1)
