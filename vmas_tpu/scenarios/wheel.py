"""Wheel scenario.

Behavioral reference: /root/reference/vmas/scenarios/wheel.py. Agents spin a
heavy line about a fixed pivot toward a desired angular speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import JaxUtils
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.line_length = kwargs.pop("line_length", 2)
        line_mass = kwargs.pop("line_mass", 30)
        self.desired_velocity = kwargs.pop("desired_velocity", 0.05)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, device)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", u_multiplier=0.6, shape=Sphere(0.03)))
        self.line = Landmark(
            name="line", collide=True, rotatable=True,
            shape=Line(length=self.line_length), mass=line_mass, color=Color.BLACK,
        )
        world.add_landmark(self.line)
        world.add_landmark(
            Landmark(name="center", shape=Sphere(radius=0.02), collide=False, color=Color.BLACK)
        )
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state,
                jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=-1.0, maxval=1.0),
            )
        state = self.line.set_rot(
            state,
            jax.random.uniform(
                jax.random.fold_in(key, 1000), (B,), minval=-jnp.pi / 2, maxval=jnp.pi / 2
            ),
        )
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.abs(jnp.abs(self.line.ang_vel(state)) - self.desired_velocity)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return -state.scenario["rew"]

    def observation(self, agent, state):
        rot = self.line.rot(state)
        line_end_1 = jnp.stack(
            [(self.line_length / 2) * jnp.cos(rot), (self.line_length / 2) * jnp.sin(rot)], axis=-1
        )
        line_end_2 = -line_end_1
        ang_vel_abs = jnp.abs(self.line.ang_vel(state))
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.line.pos(state) - agent.pos(state),
                line_end_1 - agent.pos(state),
                line_end_2 - agent.pos(state),
                jnp.mod(rot, jnp.pi)[:, None],
                ang_vel_abs[:, None],
                jnp.abs(ang_vel_abs - self.desired_velocity)[:, None],
            ],
            axis=-1,
        )


class HeuristicPolicy(BaseHeuristicPolicy):
    """Reference wheel.py:113-139."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions is True, "Heuristic for continuous actions only"
        pos_agent = observation[:, :2]
        pos_end2_agent = observation[:, 8:10]
        pos_end2 = pos_end2_agent + pos_agent
        shifted = JaxUtils.rotate_vector(
            pos_end2, jnp.full((pos_end2.shape[0],), jnp.pi / 4)
        )
        return jnp.clip(shifted - pos_agent, -u_range, u_range)
