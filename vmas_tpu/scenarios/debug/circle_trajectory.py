"""Debug: circle trajectory tracking with PID controller.

Behavioral reference: /root/reference/vmas/scenarios/debug/circle_trajectory.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Sphere, World
from vmas_tpu.core.utils import JaxUtils, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.u_range = kwargs.pop("u_range", 1)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.dt_delay = kwargs.pop("dt_delay", 0)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_radius = 0.16
        self.desired_radius = 1.5
        self.viewer_zoom = 2
        self.f_range = self.a_range + self.linear_friction

        world = World(batch_dim, device, linear_friction=self.linear_friction, dt=0.05, drag=0)
        self.agent = Agent(
            name="agent_0", shape=Sphere(self.agent_radius),
            f_range=self.f_range, u_range=self.u_range, render_action=True,
        )
        world.add_agent(self.agent)
        self.controller = VelocityController(self.agent, world, [2, 6, 0.002], "standard")
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        state = self.controller.reset(state)
        pos = jax.random.uniform(
            key, (B, 2), minval=-self.desired_radius, maxval=self.desired_radius
        )
        state = self.agent.set_pos(state, pos)
        if self.dt_delay > 0:
            scratch = dict(state.scenario)
            scratch["queue"] = jnp.zeros((self.dt_delay, B, 2), jnp.float32)
            state = state.replace(scenario=scratch)
        return state

    def process_action(self, agent, state):
        u = agent.u(state)
        if self.dt_delay > 0:
            scratch = dict(state.scenario)
            q = scratch["queue"]
            delayed = q[0]
            scratch["queue"] = jnp.concatenate([q[1:], u[None]], axis=0)
            state = state.replace(scenario=scratch)
            u = delayed
        u = JaxUtils.clamp_with_norm(u, self.u_range)
        u = jnp.where((safe_norm(u) < self.min_input_norm)[:, None], 0.0, u)
        state = agent.set_u(state, u)
        return self.controller.process_force(state)

    def _closest_point_circle(self, state, agent):
        pos = agent.pos(state)
        n = safe_norm(pos)[:, None]
        p = jnp.where(n == 0, 0.0, pos / jnp.where(n == 0, 1.0, n)) * self.desired_radius
        return p

    def _tangent_to_circle(self, state, agent, closest_point):
        pos = agent.pos(state)
        d = pos - closest_point
        inside = safe_norm(pos) < self.desired_radius
        B = pos.shape[0]
        angle90 = jnp.full((B,), jnp.pi / 2)
        rot90 = JaxUtils.rotate_vector(d, angle90)
        rot_neg90 = JaxUtils.rotate_vector(d, -angle90)
        rotated = jnp.where(inside[:, None], rot_neg90, rot90)
        n = safe_norm(rotated)[:, None]
        return jnp.where(n == 0, 0.0, rotated / jnp.where(n == 0, 1.0, n))

    def reward(self, agent, state):
        closest = self._closest_point_circle(state, agent)
        pos_rew = -(safe_norm(agent.pos(state) - closest) ** 0.5)
        tangent = self._tangent_to_circle(state, agent, closest)
        dot = jnp.sum(tangent * agent.vel(state), axis=-1) * 0.5
        return pos_rew + dot

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state), agent.pos(state)], axis=-1)

    def extra_render(self, env, ax, env_index: int = 0):
        """Trajectory goal circle + tangent-velocity line (reference
        debug/circle_trajectory.py extra_render)."""
        import numpy as np

        from vmas_tpu.render import draw

        draw.draw_circle(ax, (0.0, 0.0), self.desired_radius, (0, 0, 0))
        agent = self.world.agents[0]
        closest = self._closest_point_circle(env.state, agent)
        tangent = np.asarray(self._tangent_to_circle(env.state, agent, closest)[env_index])
        draw.draw_line(ax, (0, 0), tangent, (0, 0, 0))
