"""DOTS extension (robj0nes fork-only).

Behavioral reference: /root/reference/vmas/simulator/dots_core.py. The extra
per-entity state (agent knowledge, seeking_goal flag, payload expected
knowledge) lives in scenario scratch under entity-keyed names; the handles
expose the same knowledge accessors as the reference classes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, World
from vmas_tpu.core.state import WorldState


class DOTSWorld(World):
    """Walled arena world (reference dots_core.py:12-60)."""

    def __init__(self, batch_dim, device=None, **kwargs):
        super().__init__(batch_dim, device, **kwargs)
        self.walls = None
        self.arena_size = 5
        self.viewer_zoom = 1.7

    def spawn_map(self):
        self.walls = []
        for i in range(4):
            wall = Landmark(
                name=f"wall_{i}", collide=True,
                shape=Box(length=self.arena_size + 0.1, width=0.1), color=Color.BLACK,
            )
            self.walls.append(wall)
            self.add_landmark(wall)

    def reset_map(self, state: WorldState) -> WorldState:
        half = self.arena_size / 2
        for i, wall in enumerate(self.walls):
            x = -half if i == 0 else (half if i == 1 else 0.0)
            y = -half if i == 2 else (half if i == 3 else 0.0)
            state = wall.set_pos(state, jnp.asarray([x, y], jnp.float32))
            state = wall.set_rot(state, jnp.asarray(math.pi / 2 if i < 2 else 0.0, jnp.float32))
        return state


class DOTSAgent(Agent):
    """Agent with a knowledge state (reference dots_core.py:64-78)."""

    def __init__(self, name, knowledge_shape=None, **kwargs):
        super().__init__(name, **kwargs)
        self.knowledge_shape = knowledge_shape

    def _kkey(self):
        return f"__dots_knowledge_{self.name}"

    def _skey(self):
        return f"__dots_seeking_{self.name}"

    def spawn_dots_state(self, state: WorldState) -> WorldState:
        B = state.batch_dim
        scratch = dict(state.scenario)
        scratch[self._skey()] = jnp.zeros((B,), bool)
        if self.knowledge_shape is not None:
            scratch[self._kkey()] = jnp.zeros((B,) + tuple(self.knowledge_shape), jnp.float32)
        return state.replace(scenario=scratch)

    def knowledge(self, state: WorldState):
        return state.scenario[self._kkey()]

    def set_knowledge(self, state: WorldState, knowledge, env_mask=None) -> WorldState:
        scratch = dict(state.scenario)
        knowledge = jnp.asarray(knowledge, jnp.float32)
        if env_mask is not None:
            m = env_mask.reshape((-1,) + (1,) * (knowledge.ndim - 1))
            knowledge = jnp.where(m, knowledge, scratch[self._kkey()])
        scratch[self._kkey()] = knowledge
        return state.replace(scenario=scratch)

    def seeking_goal(self, state: WorldState):
        return state.scenario[self._skey()]

    def set_seeking_goal(self, state: WorldState, value) -> WorldState:
        scratch = dict(state.scenario)
        scratch[self._skey()] = value
        return state.replace(scenario=scratch)


class DOTSComsNetwork(Agent):
    """Virtual comms-network agent (reference dots_core.py:81-92)."""

    def __init__(self, name, **kwargs):
        kwargs.setdefault("movable", False)
        kwargs.setdefault("rotatable", False)
        kwargs.setdefault("collide", False)
        super().__init__(name, **kwargs)


class DOTSPayloadDest(Landmark):
    """Goal landmark with an expected knowledge (reference dots_core.py:166-209)."""

    def __init__(self, expected_knowledge_shape=None, **kwargs):
        super().__init__(**kwargs)
        self.expected_knowledge_shape = expected_knowledge_shape

    def _ekey(self):
        return f"__dots_expected_{self.name}"

    def spawn_dots_state(self, state: WorldState) -> WorldState:
        scratch = dict(state.scenario)
        if self.expected_knowledge_shape is not None:
            scratch[self._ekey()] = jnp.zeros(
                (state.batch_dim, self.expected_knowledge_shape), jnp.float32
            )
        return state.replace(scenario=scratch)

    def expected_knowledge(self, state: WorldState):
        return state.scenario[self._ekey()]

    def set_expected_knowledge(self, state: WorldState, knowledge, env_mask=None) -> WorldState:
        scratch = dict(state.scenario)
        knowledge = jnp.asarray(knowledge, jnp.float32)
        if env_mask is not None:
            m = env_mask[:, None]
            knowledge = jnp.where(m, knowledge, scratch[self._ekey()])
        scratch[self._ekey()] = knowledge
        return state.replace(scenario=scratch)
