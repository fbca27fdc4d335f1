"""MPE simple. Behavioral reference: /root/reference/vmas/scenarios/mpe/simple.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, World
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def uniform_positions(key, B, entities, state, lo=-1.0, hi=1.0):
    """Scatter entities uniformly (the ubiquitous MPE reset pattern)."""
    for i, e in enumerate(entities):
        pos = jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=lo, maxval=hi)
        state = e.set_pos(state, pos)
    return state


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim, device)
        world.add_agent(Agent(name="agent_0", collide=False, color=Color.GRAY))
        world.add_landmark(Landmark(name="landmark 0", collide=False, color=Color.RED))
        return world

    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        return uniform_positions(k2, state.batch_dim, self.world.landmarks, state)

    def reward(self, agent, state):
        delta = agent.pos(state) - self.world.landmarks[0].pos(state)
        return -jnp.sum(jnp.square(delta), axis=-1)

    def observation(self, agent, state):
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        return jnp.concatenate([agent.vel(state), *entity_pos], axis=-1)
