"""Debug: differential-drive dynamics.

Behavioral reference: /root/reference/vmas/scenarios/debug/diff_drive.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.core import Agent, World
from vmas_tpu.dynamics import DiffDrive, HolonomicWithRotation
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.plot_grid = True
        self.n_agents = kwargs.pop("n_agents", 2)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, device, substeps=10)
        for i in range(self.n_agents):
            if i == 0:
                agent = Agent(
                    name=f"diff_drive_{i}", collide=True, render_action=True,
                    u_range=[1, 1], u_multiplier=[1, 1],
                    dynamics=DiffDrive(world, integration="rk4"),
                )
            else:
                agent = Agent(
                    name=f"holo_rot_{i}", collide=True, render_action=True,
                    u_range=[1, 1, 1], u_multiplier=[1, 1, 0.001],
                    dynamics=HolonomicWithRotation(),
                )
            world.add_agent(agent)
        return world

    def reset_world_at(self, state, key):
        return ScenarioUtils.spawn_entities_randomly(
            self.world.agents, self.world, state, key,
            min_dist_between_entities=0.1, x_bounds=(-1, 1), y_bounds=(-1, 1),
        )

    def reward(self, agent, state):
        return jnp.zeros((state.batch_dim,), jnp.float32)

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state)], axis=-1)

    def extra_render(self, env, ax, env_index: int = 0):
        """Heading ticks (reference debug/diff_drive.py extra_render)."""
        from vmas_tpu.render import draw

        for agent in self.world.agents:
            draw.plot_entity_rotation(ax, agent, env.state, env_index, length=0.1)
