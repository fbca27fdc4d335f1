"""Debug: single-agent goal seeking with PID controller and action delay.

Behavioral reference: /root/reference/vmas/scenarios/debug/goal.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
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
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1.0)
        self.time_rew_coeff = kwargs.pop("time_rew_coeff", -0.01)
        self.energy_reward_coeff = kwargs.pop("energy_rew_coeff", 0.0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_size = (1600, 700)
        self.viewer_zoom = 2
        self.plot_grid = True
        self.agent_radius = 0.16
        self.lab_length = 6
        self.lab_width = 3
        self.f_range = self.a_range + self.linear_friction

        world = World(batch_dim, device, drag=0, dt=0.05, substeps=5)
        self.goal = Landmark("goal", collide=False, movable=False, shape=Sphere(radius=0.06))
        world.add_landmark(self.goal)
        agent = Agent(
            name="agent 0", collide=True, color=Color.GREEN, render_action=True,
            linear_friction=self.linear_friction, shape=Sphere(radius=self.agent_radius),
            f_range=self.f_range, u_range=self.u_range,
        )
        agent.goal = self.goal
        world.add_agent(agent)
        self.controller = VelocityController(agent, world, [2, 6, 0.002], "standard")
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        state = self.controller.reset(state)
        k1, k2 = jax.random.split(key)

        def rand_pos(k):
            return jnp.stack(
                [
                    jax.random.uniform(k, (B,), minval=-self.lab_length / 2, maxval=self.lab_length / 2),
                    jax.random.uniform(jax.random.fold_in(k, 1), (B,),
                                       minval=-self.lab_width / 2, maxval=self.lab_width / 2),
                ],
                axis=-1,
            )

        for agent in self.world.agents:
            state = agent.set_pos(state, rand_pos(k1))
        state = self.goal.set_pos(state, rand_pos(k2))

        scratch = dict(state.scenario)
        scratch["pos_shaping"] = (
            jnp.min(
                jnp.stack(
                    [safe_norm(self.goal.pos(state) - a.pos(state)) for a in self.world.agents],
                    axis=1,
                ),
                axis=1,
            )
            * self.pos_shaping_factor
        )
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["time_rew"] = jnp.zeros((B,), jnp.float32)
        if self.dt_delay > 0:
            scratch["queue"] = jnp.zeros((self.dt_delay, B, 2), jnp.float32)
        return state.replace(scenario=scratch)

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

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        goal_dist = jnp.min(
            jnp.stack(
                [safe_norm(self.goal.pos(state) - a.pos(state)) for a in self.world.agents], axis=1
            ),
            axis=1,
        )
        goal_reached = goal_dist < self.goal.shape.radius
        pos_shaping = goal_dist * self.pos_shaping_factor
        scratch["pos_rew"] = jnp.where(~goal_reached, scratch["pos_shaping"] - pos_shaping, 0.0)
        scratch["pos_shaping"] = pos_shaping
        scratch["time_rew"] = jnp.where(~goal_reached, self.time_rew_coeff, 0.0)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        energy = jnp.stack(
            [
                safe_norm(a.u(state)) / math.sqrt(self.world.dim_p * (self.f_range**2))
                for a in self.world.agents
            ],
            axis=1,
        ).sum(-1)
        energy_rew = -energy * self.energy_reward_coeff
        return s["pos_rew"] + energy_rew + s["time_rew"]

    def observation(self, agent, state):
        return jnp.concatenate(
            [agent.pos(state), agent.vel(state), agent.pos(state) - self.goal.pos(state)],
            axis=-1,
        )

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "time_rew": state.scenario["time_rew"]}
