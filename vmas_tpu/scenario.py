"""Scenario author API.

Behavioral reference: /root/reference/vmas/simulator/scenario.py (BaseScenario
contract). The TPU-native contract keeps the same hooks but makes them pure
functions over the :class:`WorldState` pytree so the whole
reset/step/observe/reward pipeline compiles into a single XLA program:

* ``make_world(batch_dim, device, **kwargs)`` — unchanged: build the world with
  the same entity-declaration API as the reference.
* ``reset_world_at(state, key) -> state`` — vectorized over ALL envs; the
  environment blends the result with the previous state under a ``[B]`` mask
  (one-hot for ``reset_at(i)``), replacing the reference's ``env_index``
  threading (scenario.py:152-227).
* ``observation(agent, state)`` / ``reward(agent, state)`` — pure reads.
* ``pre_rewards(state)`` / ``post_rewards(state)`` — explicit versions of the
  reference scenarios' hidden ``is_first``/``is_last`` mutation blocks (e.g.
  transport.py:131-161): cross-agent reward bookkeeping goes here, stored in
  ``state.scenario`` scratch.
* ``process_action(agent, state)``, ``pre_step``, ``post_step`` — as reference.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional

import jax.numpy as jnp

from vmas_tpu.core.state import WorldState
from vmas_tpu.core.utils import INITIAL_VIEWER_SIZE, VIEWER_DEFAULT_ZOOM
from vmas_tpu.core.world import Agent, World


class BaseScenario(ABC):
    def __init__(self):
        """Do not override."""
        self._world: Optional[World] = None
        self.viewer_size = INITIAL_VIEWER_SIZE
        self.viewer_zoom = VIEWER_DEFAULT_ZOOM
        self.render_origin = (0.0, 0.0)
        self.plot_grid = False
        self.grid_spacing = 0.1
        self.visualize_semidims = True

    @property
    def world(self) -> World:
        assert self._world is not None, "You first need to set `self._world` in the `make_world` method"
        return self._world

    # -- environment-facing, do not override ----------------------------
    def env_make_world(self, batch_dim: int, device=None, **kwargs) -> World:
        self._world = self.make_world(batch_dim, device, **kwargs)
        self._world.finalize()
        return self._world

    def env_reset_world_at(self, state: WorldState, key) -> WorldState:
        """Zero world state, run the scenario reset, re-sync joints.

        Mirrors scenario.env_reset_world_at (reference scenario.py:86-89); the
        caller blends the result under the reset mask.
        """
        state = self.world.zeroed(state)
        state = self.reset_world_at(state, key)
        return self.world.sync_joints(state)

    def env_process_action(self, agent: Agent, state: WorldState) -> WorldState:
        """Reference scenario.py:91-97."""
        if agent.action_script is not None:
            state = agent.action_script(agent, self.world, state)
        state = self.process_action(agent, state)
        return agent.dynamics.check_and_process_action(self.world, state)

    # -- required hooks --------------------------------------------------
    @abstractmethod
    def make_world(self, batch_dim: int, device=None, **kwargs) -> World: ...

    @abstractmethod
    def reset_world_at(self, state: WorldState, key) -> WorldState:
        """Vectorized reset of ALL envs; the env applies the reset mask."""
        ...

    @abstractmethod
    def observation(self, agent: Agent, state: WorldState): ...

    def observations(self, state: WorldState):
        """Optional batch hook: all policy agents' observations at once.

        Return a tuple of per-agent observation arrays (policy-agent order)
        to REPLACE the per-agent ``observation`` calls, or None to use them.
        Lets a scenario compute every ego's observation in one fused pass
        (e.g. road_traffic's all-ego pallas kernel) without N separate
        hook invocations."""
        return None

    @abstractmethod
    def reward(self, agent: Agent, state: WorldState): ...

    # -- optional hooks --------------------------------------------------
    def done(self, state: WorldState):
        return jnp.zeros((state.batch_dim,), dtype=bool)

    def info(self, agent: Agent, state: WorldState) -> Dict:
        return {}

    def pre_rewards(self, state: WorldState) -> WorldState:
        """Cross-agent bookkeeping before per-agent rewards (the reference's
        ``is_first`` pattern)."""
        return state

    def post_rewards(self, state: WorldState) -> WorldState:
        """Cross-agent bookkeeping after per-agent rewards (``is_last``)."""
        return state

    def process_action(self, agent: Agent, state: WorldState) -> WorldState:
        return state

    def pre_step(self, state: WorldState) -> WorldState:
        return state

    def post_step(self, state: WorldState) -> WorldState:
        return state

    @staticmethod
    def obs_key(state: WorldState, i: int = 0):
        """Per-step PRNG key for observation noise (injected by the
        environment before observations are computed). Fold ``i`` for
        independent per-agent streams."""
        import jax

        return jax.random.fold_in(state.scenario["__obs_key"], i)

    def extra_render(self, env, ax, env_index: int = 0) -> None:
        """Draw scenario-specific debug geoms BELOW the entity layer.

        Reference BaseScenario.extra_render returns pyglet Geoms
        (scenario.py:24-451); the TPU build draws host-side, so hooks
        receive the live Environment, a matplotlib Axes, and the env index,
        and paint with :mod:`vmas_tpu.render.draw` helpers."""

    def top_layer_render(self, env, ax, env_index: int = 0) -> None:
        """Like :meth:`extra_render`, drawn ABOVE the entity layer."""


class BaseHeuristicPolicy(ABC):
    """Reference heuristic_policy.py:9-21."""

    def __init__(self, continuous_action: bool):
        self.continuous_actions = continuous_action

    @abstractmethod
    def compute_action(self, observation, u_range): ...


class RandomPolicy(BaseHeuristicPolicy):
    def compute_action(self, observation, u_range):
        import jax

        n_envs = observation.shape[0]
        key = jax.random.PRNGKey(int(jnp.sum(observation * 1e3)) & 0x7FFFFFFF)
        return jax.random.uniform(key, (n_envs, 2), minval=-u_range, maxval=u_range)
