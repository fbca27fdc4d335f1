"""Sensors.

Behavioral reference: /root/reference/vmas/simulator/sensors.py. ``measure``
is functional (takes the state); ray casting runs through the fully batched
``World.cast_rays`` kernel ([B, n_entities, n_rays] in one op).
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod
from typing import Callable, Tuple, Union

import numpy as np
import jax.numpy as jnp

from vmas_tpu.core.state import WorldState
from vmas_tpu.core.utils import Color


class Sensor(ABC):
    def __init__(self, world):
        self._world = world
        self._agent = None

    @property
    def agent(self):
        return self._agent

    @agent.setter
    def agent(self, agent):
        self._agent = agent

    @abstractmethod
    def measure(self, state: WorldState): ...

    def render(self, env_index: int = 0):
        return []


class Lidar(Sensor):
    """Reference sensors.py:46-161."""

    def __init__(
        self,
        world,
        angle_start: float = 0.0,
        angle_end: float = 2 * math.pi,
        n_rays: int = 8,
        max_range: float = 1.0,
        entity_filter: Callable = lambda _: True,
        render_color: Union[Color, Tuple[float, float, float]] = Color.GRAY,
        alpha: float = 1.0,
        render: bool = True,
    ):
        super().__init__(world)
        if (angle_start - angle_end) % (2 * math.pi) < 1e-5:
            angles = np.linspace(angle_start, angle_end, n_rays + 1, dtype=np.float32)[:n_rays]
        else:
            angles = np.linspace(angle_start, angle_end, n_rays, dtype=np.float32)
        self._angles = jnp.asarray(angles)  # [R]
        self.max_range = max_range
        self._render = render
        self.entity_filter = entity_filter
        self._render_color = render_color
        self.alpha = alpha
        self._last_measurement = None

    @property
    def render_color(self):
        if isinstance(self._render_color, Color):
            return self._render_color.value
        return self._render_color

    def measure(self, state: WorldState, vectorized: bool = True):
        """[B, n_rays] hit distances; rays rotate with the agent heading
        (reference sensors.py:100-122)."""
        angles = self._angles[None, :] + self.agent.rot(state)[:, None]
        if vectorized:
            meas = self._world.cast_rays(
                state, self.agent, angles, self.max_range, self.entity_filter
            )
        else:
            cols = [
                self._world.cast_ray(
                    state, self.agent, angles[:, i], self.max_range, self.entity_filter
                )
                for i in range(angles.shape[1])
            ]
            meas = jnp.stack(cols, axis=1)
        self._last_measurement = meas
        return meas

    def set_render(self, render: bool):
        self._render = render
