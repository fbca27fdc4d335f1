"""Debug: line trajectory tracking with PID controller.

Behavioral reference: /root/reference/vmas/scenarios/debug/line_trajectory.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.obs_noise = kwargs.pop("obs_noise", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_radius = 0.03
        self.line_length = 3

        world = World(batch_dim, device, drag=0.1)
        self.agent = Agent(
            name="agent_0", shape=Sphere(self.agent_radius), mass=2,
            f_range=0.5, u_range=1, render_action=True,
        )
        world.add_agent(self.agent)
        self.controller = VelocityController(self.agent, world, [4, 1.25, 0.001], "standard")
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        state = self.controller.reset(state)
        kx, ky = jax.random.split(key)
        pos = jnp.stack(
            [
                jax.random.uniform(kx, (B,), minval=-1.0, maxval=1.0),
                jax.random.uniform(ky, (B,), minval=-1.0, maxval=0.0),
            ],
            axis=-1,
        )
        state = self.agent.set_pos(state, pos)
        scratch = dict(state.scenario)
        scratch["vel_action"] = jnp.zeros((B, 2), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        scratch = dict(state.scenario)
        scratch["vel_action"] = agent.u(state)
        state = state.replace(scenario=scratch)
        return self.controller.process_force(state)

    def reward(self, agent, state):
        pos = agent.pos(state)
        closest = pos.at[:, X].set(0.0)
        pos_rew = -(safe_norm(pos - closest) ** 0.5)
        tangent = jnp.zeros_like(pos).at[:, Y].set(1.0)
        dot_product = jnp.sum(tangent * agent.vel(state), axis=-1) * 0.5

        def _normalize(v):
            n = safe_norm(v)[:, None]
            return jnp.where(n == 0, 0.0, v / jnp.where(n == 0, 1.0, n))

        steady = (
            jnp.sum(
                _normalize(agent.vel(state)) * _normalize(state.scenario["vel_action"]), axis=-1
            )
            * 0.2
        )
        return pos_rew + dot_product + steady

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state), agent.pos(state)], axis=-1)

    def done(self, state):
        return self.world.agents[0].pos(state)[:, Y] > self.line_length - 1

    def extra_render(self, env, ax, env_index: int = 0):
        """Trajectory goal line (reference debug/line_trajectory.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_line(ax, (0, -1), (0, -1 + self.line_length), (0, 0, 0))
