"""Constants and array utilities for the TPU-native VMAS re-implementation.

Behavioral reference: /root/reference/vmas/simulator/utils.py:21-34 (constants),
utils.py:166-236 (TorchUtils). Everything here is pure jax.numpy, written for
XLA: no data-dependent control flow, safe divisions so gradients stay finite
even on masked-out lanes (the torch reference relies on IEEE inf/nan being
discarded by masked assignment, which poisons reverse-mode gradients in JAX).
"""

from __future__ import annotations

from enum import Enum

import jax.numpy as jnp

X = 0
Y = 1
ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
VIEWER_DEFAULT_ZOOM = 1.2
INITIAL_VIEWER_SIZE = (700, 700)
# Same force-model constants as the reference (utils.py:27-34).
LINE_MIN_DIST = 4 / 6e2
COLLISION_FORCE = 100.0
JOINT_FORCE = 130.0
TORQUE_CONSTRAINT_FORCE = 1.0

DRAG = 0.25
LINEAR_FRICTION = 0.0
ANGULAR_FRICTION = 0.0


class Color(Enum):
    RED = (0.75, 0.25, 0.25)
    GREEN = (0.25, 0.75, 0.25)
    BLUE = (0.25, 0.25, 0.75)
    LIGHT_GREEN = (0.45, 0.95, 0.45)
    WHITE = (0.75, 0.75, 0.75)
    GRAY = (0.25, 0.25, 0.25)
    BLACK = (0.15, 0.15, 0.15)
    ORANGE = (1.00, 0.50, 0.0)
    PINK = (0.97, 0.51, 0.75)
    PURPLE = (0.60, 0.31, 0.64)
    YELLOW = (0.87, 0.87, 0.0)


class JaxUtils:
    """Vector helpers mirroring TorchUtils (reference utils.py:166-236).

    Conventions differ from the reference on purpose: rotations are stored as
    trailing-scalar arrays ``[...]`` (not ``[..., 1]``), which keeps every array
    tightly packed for the TPU's (8, 128) vector tiles.
    """

    @staticmethod
    def rotate_vector(vector: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
        """Rotate 2D vectors ``[..., 2]`` by angles ``[...]``."""
        if angle.ndim == vector.ndim:
            angle = angle[..., 0]
        cos = jnp.cos(angle)
        sin = jnp.sin(angle)
        return jnp.stack(
            [
                vector[..., X] * cos - vector[..., Y] * sin,
                vector[..., X] * sin + vector[..., Y] * cos,
            ],
            axis=-1,
        )

    @staticmethod
    def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """2D scalar cross product, shape ``[...]`` (no trailing 1)."""
        return a[..., X] * b[..., Y] - a[..., Y] * b[..., X]

    @staticmethod
    def compute_torque(f: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
        return JaxUtils.cross(r, f)

    @staticmethod
    def clamp_with_norm(tensor: jnp.ndarray, max_norm) -> jnp.ndarray:
        """Scale vectors whose norm exceeds ``max_norm`` back onto the ball.

        Matches TorchUtils.clamp_with_norm (utils.py:168-173) forward-exactly;
        the division is guarded so the untaken branch cannot produce NaN
        gradients.
        """
        norm = jnp.linalg.norm(tensor, axis=-1, keepdims=True)
        cond = norm > max_norm
        safe_norm = jnp.where(cond, norm, 1.0)
        return jnp.where(cond, tensor / safe_norm * max_norm, tensor)

    @staticmethod
    def where_from_mask(mask: jnp.ndarray, new_value, old_value: jnp.ndarray):
        """Masked write over the leading env axis (mask ``[B]`` bools)."""
        mask = mask.reshape(mask.shape + (1,) * (old_value.ndim - mask.ndim))
        return jnp.where(mask, new_value, old_value)

    @staticmethod
    def recursive_clone(value):
        """Structural copy of a (nested) dict of arrays (reference
        TorchUtils.recursive_clone, utils.py:215-219). JAX arrays are
        immutable, so only the container structure needs rebuilding — the
        leaves pass through unchanged."""
        if isinstance(value, dict):
            return {key: JaxUtils.recursive_clone(val) for key, val in value.items()}
        return value


def safe_div(num: jnp.ndarray, den: jnp.ndarray, eps: float = 0.0):
    """num / den with zero denominators replaced (caller must mask results)."""
    safe = jnp.where(den == 0.0, 1.0 if eps == 0.0 else eps, den)
    return num / safe


def safe_norm(vec: jnp.ndarray, axis: int = -1):
    """L2 norm with a subgradient-safe zero (norm grad at 0 is 0, not NaN)."""
    sq = jnp.sum(vec * vec, axis=axis)
    is_zero = sq == 0.0
    return jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))
