"""Wind flocking scenario (heterogeneous pair drafting in wind; SND paper).

Behavioral reference: /root/reference/vmas/scenarios/wind_flocking.py. The
big agent's wind (per-env gravity tensor, wind_flocking.py:143-148, 356-370)
uses the dynamic-gravity state field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def angle_to_vector(angle):
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def get_line_angle_0_180(rot):
    return jnp.mod(rot, jnp.pi)


def get_line_angle_dist_0_360(angle, goal):
    return -jnp.sum(angle_to_vector(angle) * angle_to_vector(goal), axis=-1)


def get_line_angle_dist_0_180(angle, goal):
    angle = get_line_angle_0_180(angle)
    goal = get_line_angle_0_180(goal)
    return jnp.minimum(
        jnp.abs(angle - goal),
        jnp.minimum(jnp.abs(angle - (goal - jnp.pi)), jnp.abs((angle - jnp.pi) - goal)),
    )


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.plot_grid = True
        self.viewer_zoom = 2
        self.vel_shaping_factor = kwargs.pop("vel_shaping_factor", 1)
        self.dist_shaping_factor = kwargs.pop("dist_shaping_factor", 1)
        self.wind_shaping_factor = kwargs.pop("wind_shaping_factor", 1)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 0)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 0)
        self.energy_shaping_factor = kwargs.pop("energy_shaping_factor", 0)
        self.observe_rel_pos = kwargs.pop("observe_rel_pos", False)
        self.observe_rel_vel = kwargs.pop("observe_rel_vel", False)
        self.observe_pos = kwargs.pop("observe_pos", True)
        self.use_controller = kwargs.pop("use_controller", True)
        wind = kwargs.pop("wind", 2)
        self.v_range = kwargs.pop("v_range", 0.5)
        desired_vel = kwargs.pop("desired_vel", self.v_range)
        self.f_range = kwargs.pop("f_range", 100)
        self.cover_angle_tolerance = kwargs.pop("cover_angle_tolerance", 1)
        self.horizon = kwargs.pop("horizon", 200)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        controller_params = [1.5, 0.6, 0.002]
        self.u_range = self.v_range if self.use_controller else self.f_range
        self.desired_distance = 1
        self.grid_spacing = self.desired_distance
        self.wind_vec = jnp.asarray([0.0, -wind], jnp.float32)

        world = World(batch_dim, device, drag=0, linear_friction=0.1)
        world.dynamic_gravity = True

        self.desired_vel = jnp.asarray([0.0, desired_vel], jnp.float32)
        self.max_pos = (self.horizon * world.dt) * desired_vel
        self.desired_pos = 10.0
        self.n_agents = 2

        self.big_agent = Agent(
            name="agent_0", render_action=True, shape=Sphere(radius=0.05),
            u_range=self.u_range, v_range=self.v_range, f_range=self.f_range,
        )
        world.add_agent(self.big_agent)
        self.small_agent = Agent(
            name="agent_1", render_action=True, shape=Sphere(radius=0.03),
            u_range=self.u_range, v_range=self.v_range, f_range=self.f_range,
        )
        world.add_agent(self.small_agent)
        self.controllers = {
            a.name: VelocityController(a, world, controller_params, "standard")
            for a in world.agents
        }
        return world

    def _agents_angle(self, state):
        d = self.big_agent.pos(state) - self.small_agent.pos(state)
        return jnp.arctan2(d[:, Y], d[:, X])

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        start_angle = jax.random.uniform(k1, (B,), minval=-jnp.pi / 8, maxval=jnp.pi / 8)
        delta = jnp.stack(
            [(self.desired_distance / 2) * jnp.cos(start_angle),
             (self.desired_distance / 2) * jnp.sin(start_angle)],
            axis=-1,
        )
        swap = jax.random.bernoulli(k2, 0.5, (B,))
        sign = jnp.where(swap, -1.0, 1.0)[:, None]
        state = self.world.agents[0].set_pos(state, -sign * delta)
        state = self.world.agents[1].set_pos(state, sign * delta)
        for agent in self.world.agents:
            state = self.controllers[agent.name].reset(state)
            state = agent.set_gravity(state, self.wind_vec)

        scratch = dict(state.scenario)
        scratch["t"] = jnp.zeros((B,), jnp.int32)
        scratch["vel_shaping"] = jnp.stack(
            [safe_norm(a.vel(state) - self.desired_vel) * self.vel_shaping_factor
             for a in self.world.agents], axis=-1,
        )
        scratch["energy_shaping"] = jnp.zeros((B, 2), jnp.float32)
        scratch["wind_shaping"] = jnp.stack(
            [safe_norm(state.dyn_gravity[:, a.index]) * self.wind_shaping_factor
             for a in self.world.agents], axis=-1,
        )
        scratch["distance_shaping"] = (
            jnp.abs(safe_norm(self.small_agent.pos(state) - self.big_agent.pos(state)) - self.desired_distance)
            * self.dist_shaping_factor
        )
        scratch["pos_shaping"] = (
            jnp.abs(
                jnp.maximum(self.big_agent.pos(state)[:, Y], self.small_agent.pos(state)[:, Y])
                - self.desired_pos
            )
            * self.pos_shaping_factor
        )
        scratch["rot_shaping"] = (
            get_line_angle_dist_0_180(self._agents_angle(state), 0.0) * self.rot_shaping_factor
        )
        for k in ["dist_rew", "rot_rew", "pos_rew", "vel_reward", "energy_rew", "wind_rew"]:
            scratch[k] = jnp.zeros((B,), jnp.float32)
        scratch["agent_wind_rew"] = jnp.zeros((B, 2), jnp.float32)
        scratch["agent_vel_rew"] = jnp.zeros((B, 2), jnp.float32)
        scratch["agent_energy_rew"] = jnp.zeros((B, 2), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        if self.use_controller:
            return self.controllers[agent.name].process_force(state)
        return state

    def _set_friction(self, state):
        """Reference set_friction (wind_flocking.py:356-370): scale the big
        agent's wind by how well the pair covers the wind direction."""
        d = (
            get_line_angle_dist_0_360(
                self._agents_angle(state), jnp.full((state.batch_dim,), -jnp.pi / 2)
            )
            + 1
        )
        d = jnp.clip(d, max=self.cover_angle_tolerance) + (1 - self.cover_angle_tolerance)
        d = (d - 1 + self.cover_angle_tolerance) / self.cover_angle_tolerance
        return self.big_agent.set_gravity(state, self.wind_vec[None] * d[:, None])

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["t"] = scratch["t"] + 1
        t = scratch["t"]
        state = state.replace(scenario=scratch)
        state = self._set_friction(state)
        scratch = dict(state.scenario)

        distance_shaping = (
            jnp.abs(safe_norm(self.small_agent.pos(state) - self.big_agent.pos(state)) - self.desired_distance)
            * self.dist_shaping_factor
        )
        scratch["dist_rew"] = scratch["distance_shaping"] - distance_shaping
        scratch["distance_shaping"] = distance_shaping

        rot_shaping = get_line_angle_dist_0_180(self._agents_angle(state), 0.0) * self.rot_shaping_factor
        scratch["rot_rew"] = scratch["rot_shaping"] - rot_shaping
        scratch["rot_shaping"] = rot_shaping

        pos_shaping = (
            jnp.abs(
                jnp.maximum(self.big_agent.pos(state)[:, Y], self.small_agent.pos(state)[:, Y])
                - self.desired_pos
            )
            * self.pos_shaping_factor
        )
        scratch["pos_rew"] = scratch["pos_shaping"] - pos_shaping
        scratch["pos_shaping"] = pos_shaping

        vel_shaping = jnp.stack(
            [safe_norm(a.vel(state) - self.desired_vel) * self.vel_shaping_factor
             for a in self.world.agents], axis=-1,
        )
        scratch["agent_vel_rew"] = scratch["vel_shaping"] - vel_shaping
        scratch["vel_shaping"] = vel_shaping
        scratch["vel_reward"] = scratch["agent_vel_rew"].mean(-1)

        energy_shaping = jnp.stack(
            [safe_norm(a.u(state)) * self.energy_shaping_factor for a in self.world.agents],
            axis=-1,
        )
        agent_energy_rew = scratch["energy_shaping"] - energy_shaping
        agent_energy_rew = jnp.where((t < 10)[:, None], 0.0, agent_energy_rew)
        scratch["agent_energy_rew"] = agent_energy_rew
        scratch["energy_shaping"] = energy_shaping
        scratch["energy_rew"] = agent_energy_rew.mean(-1)

        wind_shaping = jnp.stack(
            [safe_norm(state.dyn_gravity[:, a.index]) * self.wind_shaping_factor
             for a in self.world.agents], axis=-1,
        )
        agent_wind_rew = scratch["wind_shaping"] - wind_shaping
        agent_wind_rew = jnp.where((t < 5)[:, None], 0.0, agent_wind_rew)
        scratch["agent_wind_rew"] = agent_wind_rew
        scratch["wind_shaping"] = wind_shaping
        scratch["wind_rew"] = agent_wind_rew.mean(-1)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        return (
            s["dist_rew"] + s["vel_reward"] + s["rot_rew"]
            + s["energy_rew"] + s["wind_rew"] + s["pos_rew"]
        )

    def observation(self, agent, state):
        observations = []
        if self.observe_pos:
            observations.append(agent.pos(state))
        observations.append(agent.vel(state))
        if self.observe_rel_pos:
            for a in self.world.agents:
                if a is not agent:
                    observations.append(a.pos(state) - agent.pos(state))
        if self.observe_rel_vel:
            for a in self.world.agents:
                if a is not agent:
                    observations.append(a.vel(state) - agent.vel(state))
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent, state):
        s = state.scenario
        i = agent.slot
        return {
            "dist_rew": s["dist_rew"],
            "rot_rew": s["rot_rew"],
            "pos_rew": s["pos_rew"],
            "agent_wind_rew": s["agent_wind_rew"][:, i],
            "agent_vel_rew": s["agent_vel_rew"][:, i],
            "agent_energy_rew": s["agent_energy_rew"][:, i],
            "delta_vel_to_goal": safe_norm(agent.vel(state) - self.desired_vel),
        }

    def extra_render(self, env, ax, env_index: int = 0):
        """Pair-axis line between the agents + the goal Y line (reference
        wind_flocking.py extra_render)."""
        import numpy as np

        from vmas_tpu.render import draw

        state = env.state
        pb = np.asarray(self.big_agent.pos(state)[env_index])
        ps = np.asarray(self.small_agent.pos(state)[env_index])
        mid = (pb + ps) / 2
        ang = np.arctan2(*(pb - ps)[::-1])
        d = self.desired_distance / 2 * np.array([np.cos(ang), np.sin(ang)])
        draw.draw_line(ax, mid - d, mid + d, (0, 0, 0))
        half = self.desired_distance / 2
        draw.draw_line(ax, (-half, self.max_pos), (half, self.max_pos), (1, 0, 0))
