"""Debug: asymmetric joint rotation to a goal angle.

Behavioral reference: /root/reference/vmas/scenarios/debug/asym_joint.py.
Two joined agents (optionally with an off-center mass rigidly attached to the
joint body) must rotate the joint line to +-90 degrees.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Joint, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def get_line_angle_0_180(rot):
    return jnp.mod(rot, jnp.pi)


def get_line_angle_dist_0_180(angle, goal):
    angle = get_line_angle_0_180(angle)
    goal = get_line_angle_0_180(goal)
    return jnp.minimum(
        jnp.abs(angle - goal),
        jnp.minimum(jnp.abs(angle - (goal - jnp.pi)), jnp.abs((angle - jnp.pi) - goal)),
    )


def angle_to_vector(angle):
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.joint_length = kwargs.pop("joint_length", 0.5)
        self.random_start_angle = kwargs.pop("random_start_angle", False)
        self.observe_joint_angle = kwargs.pop("observe_joint_angle", False)
        self.joint_angle_obs_noise = kwargs.pop("joint_angle_obs_noise", 0.0)
        self.asym_package = kwargs.pop("asym_package", True)
        self.mass_ratio = kwargs.pop("mass_ratio", 5)
        self.mass_position = kwargs.pop("mass_position", 0.75)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        self.obs_noise = kwargs.pop("obs_noise", 0.2)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 1)
        self.energy_reward_coeff = kwargs.pop("energy_reward_coeff", 0.08)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(
            batch_dim, device,
            substeps=7 if not self.asym_package else 10,
            joint_force=900 if self.asym_package else 400,
            drag=0.25 if not self.asym_package else 0.15,
        )
        if not self.observe_joint_angle:
            assert self.joint_angle_obs_noise == 0
        self.goal_angle = math.pi / 2
        self.n_agents = 2
        self.agent_radius = 0.03333
        self.mass_radius = self.agent_radius * (2 / 3)

        world.add_agent(
            Agent(name="agent 0", shape=Sphere(self.agent_radius), u_multiplier=0.8,
                  obs_noise=self.obs_noise, render_action=True)
        )
        world.add_agent(
            Agent(name="agent 1", shape=Sphere(self.agent_radius), u_multiplier=0.8,
                  mass=1 if self.asym_package else self.mass_ratio,
                  max_speed=self.max_speed_1, obs_noise=self.obs_noise, render_action=True)
        )
        self.joint = Joint(
            world.agents[0], world.agents[1],
            anchor_a=(0, 0), anchor_b=(0, 0), dist=self.joint_length,
            rotate_a=True, rotate_b=True, collidable=False, width=0, mass=1,
        )
        world.add_joint(self.joint)

        if self.asym_package:
            self.mass = Landmark(
                name="mass", shape=Sphere(radius=self.mass_radius), collide=False,
                movable=True, color=Color.BLACK, mass=self.mass_ratio,
                collision_filter=lambda e: not isinstance(e.shape, Sphere),
            )
            world.add_landmark(self.mass)
            world.add_joint(
                Joint(
                    self.mass, self.joint.landmark,
                    anchor_a=(0, 0), anchor_b=(self.mass_position, 0),
                    dist=0, rotate_a=True, rotate_b=True,
                )
            )
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        lim = jnp.pi / 2 if self.random_start_angle else 0.0
        start_angle = jax.random.uniform(k1, (B,), minval=-lim, maxval=lim)
        delta = jnp.stack(
            [(self.joint_length / 2) * jnp.cos(start_angle),
             (self.joint_length / 2) * jnp.sin(start_angle)],
            axis=-1,
        )
        joint_pos = jnp.zeros((B, 2), jnp.float32)
        # per-env random agent-order swap (reference randperm, asym_joint.py:177)
        swap = jax.random.bernoulli(k2, 0.5, (B,))
        sign = jnp.where(swap, -1.0, 1.0)[:, None]
        state = self.world.agents[0].set_pos(state, joint_pos - sign * delta)
        state = self.world.agents[1].set_pos(state, joint_pos + sign * delta)
        if self.asym_package:
            state = self.mass.set_pos(state, joint_pos + self.mass_position * delta * sign)

        state = self.world.sync_joints(state)
        scratch = dict(state.scenario)
        scratch["rot_shaping_pre"] = (
            get_line_angle_dist_0_180(self.joint.landmark.rot(state), self.goal_angle)
            * self.rot_shaping_factor
        )
        scratch["rot_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["energy_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = get_line_angle_dist_0_180(self.joint.landmark.rot(state), self.goal_angle)
        joint_shaping = dist * self.rot_shaping_factor
        scratch["rot_rew"] = scratch["rot_shaping_pre"] - joint_shaping
        scratch["rot_shaping_pre"] = joint_shaping
        energy = jnp.stack(
            [
                safe_norm(a.u(state))
                / math.sqrt(self.world.dim_p * float((a.u_range_array[0] * a.u_multiplier_array[0]) ** 2))
                for a in self.world.agents
            ],
            axis=1,
        ).sum(-1)
        scratch["energy_rew"] = -energy * self.energy_reward_coeff
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rot_rew"] + state.scenario["energy_rew"]

    def observation(self, agent, state):
        observations = [agent.pos(state), agent.vel(state)]
        if self.observe_joint_angle:
            joint_angle = self.joint.landmark.rot(state)
            if self.joint_angle_obs_noise:
                joint_angle = joint_angle + (
                    jax.random.normal(self.obs_key(state, 100 + agent.slot), joint_angle.shape)
                    * self.joint_angle_obs_noise
                )
            observations.append(angle_to_vector(joint_angle))
        if self.obs_noise > 0:
            noisy = []
            for i, obs in enumerate(observations):
                k = self.obs_key(state, agent.slot * 10 + i)
                noisy.append(
                    obs + jax.random.uniform(k, obs.shape, minval=-self.obs_noise, maxval=self.obs_noise)
                )
            observations = noisy
        return jnp.concatenate(observations, axis=-1)

    def done(self, state):
        return (
            get_line_angle_dist_0_180(self.joint.landmark.rot(state), self.goal_angle) <= 0.01
        )

    def info(self, agent, state):
        return {"rot_rew": state.scenario["rot_rew"], "energy_rew": state.scenario["energy_rew"]}

    def extra_render(self, env, ax, env_index: int = 0):
        """Green origin marker (reference debug/asym_joint.py extra_render)."""
        from vmas_tpu.core.utils import Color
        from vmas_tpu.render import draw

        draw.draw_circle(ax, (0.0, 0.0), 0.01, Color.GREEN, filled=True)
