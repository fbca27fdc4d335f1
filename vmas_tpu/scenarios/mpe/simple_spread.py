"""MPE simple_spread (the reference's MPE-comparison benchmark scenario).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_spread.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.mpe.simple import uniform_positions
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        num_agents = kwargs.pop("n_agents", 3)
        self.obs_agents = kwargs.pop("obs_agents", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim=batch_dim, device=device)
        for i in range(num_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", collide=True, shape=Sphere(radius=0.15), color=Color.BLUE)
            )
        for i in range(num_agents):
            world.add_landmark(Landmark(name=f"landmark {i}", collide=False, color=Color.BLACK))
        return world

    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.zeros((state.batch_dim,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        agents = self.world.agents
        a_idx = jnp.asarray([a.index for a in agents])
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        a_pos = state.pos[:, a_idx]  # [B, A, 2]
        l_pos = state.pos[:, l_idx]  # [B, L, 2]
        # min over agents of dist to each landmark, summed over landmarks and
        # repeated per agent (reference simple_spread.py:88-102)
        dist = safe_norm(a_pos[:, :, None, :] - l_pos[:, None, :, :])  # [B, A, L]
        closest = jnp.min(dist, axis=1)  # [B, L]
        rew = -jnp.sum(closest, axis=-1) * len(agents)
        # collision penalty: -1 per overlapping ordered agent pair per agent
        for single_agent in agents:
            if single_agent.collide:
                for a in agents:
                    if a is not single_agent:
                        rew = rew - self.world.is_overlapping(state, a, single_agent).astype(
                            jnp.float32
                        )
        scratch = dict(state.scenario)
        scratch["rew"] = rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        landmark_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        other_pos = [
            other.pos(state) - agent.pos(state) for other in self.world.agents if other is not agent
        ]
        return jnp.concatenate(
            [agent.pos(state), agent.vel(state), *landmark_pos, *(other_pos if self.obs_agents else [])],
            axis=-1,
        )
