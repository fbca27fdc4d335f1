"""Debug: 3D drone dynamics.

Behavioral reference: /root/reference/vmas/scenarios/debug/drone.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.core import Agent, World
from vmas_tpu.dynamics import Drone
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.plot_grid = True
        self.n_agents = kwargs.pop("n_agents", 2)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, device, substeps=10)
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"drone_{i}", collide=True, render_action=True,
                    u_range=[0.00001, 0.00001, 0.00001],
                    u_multiplier=[1, 1, 1],
                    action_size=3,  # torque-only interactive control
                    dynamics=Drone(world, integration="rk4"),
                )
            )
        return world

    def reset_world_at(self, state, key):
        return ScenarioUtils.spawn_entities_randomly(
            self.world.agents, self.world, state, key,
            min_dist_between_entities=0.1, x_bounds=(-1, 1), y_bounds=(-1, 1),
        )

    def process_action(self, agent, state):
        torque = agent.u(state)
        thrust = jnp.full((state.batch_dim, 1), agent.mass * agent.dynamics.g, jnp.float32)
        return agent.set_u(state, jnp.concatenate([thrust, torque], axis=-1))

    def reward(self, agent, state):
        return jnp.zeros((state.batch_dim,), jnp.float32)

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state)], axis=-1)

    def done(self, state):
        return jnp.any(
            jnp.stack([a.dynamics.needs_reset(state) for a in self.world.agents], axis=-1),
            axis=-1,
        )

    def extra_render(self, env, ax, env_index: int = 0):
        """Heading ticks (reference debug/drone.py extra_render)."""
        from vmas_tpu.render import draw

        for agent in self.world.agents:
            draw.plot_entity_rotation(ax, agent, env.state, env_index, length=0.1)
