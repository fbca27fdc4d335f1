"""Dropout scenario.

Behavioral reference: /root/reference/vmas/scenarios/dropout.py. Any agent
reaching the shared goal earns the team reward once; actions carry an energy
penalty, so the team should "drop out" redundant movers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils

DEFAULT_ENERGY_COEFF = 0.02


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.energy_coeff = kwargs.pop("energy_coeff", DEFAULT_ENERGY_COEFF)
        self.start_same_point = kwargs.pop("start_same_point", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.agent_radius = 0.05
        self.goal_radius = 0.03

        world = World(batch_dim, device)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", collide=False, shape=Sphere(radius=self.agent_radius)))
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=self.goal_radius), color=Color.GREEN
        )
        world.add_landmark(self.goal)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        if self.start_same_point:
            for agent in self.world.agents:
                state = agent.set_pos(state, jnp.zeros((B, 2), jnp.float32))
            state = ScenarioUtils.spawn_entities_randomly(
                self.world.landmarks, self.world, state, key,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1), y_bounds=(-1, 1),
                occupied_positions=jnp.zeros((B, 1, 2), jnp.float32),
            )
        else:
            state = ScenarioUtils.spawn_entities_randomly(
                self.world.policy_agents + self.world.landmarks, self.world, state, key,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1), y_bounds=(-1, 1),
            )
        state = self.goal.set_rendering(state, True)
        scratch = dict(state.scenario)
        scratch["eaten"] = jnp.zeros((B,), bool)
        scratch["done"] = jnp.zeros((B,), bool)
        scratch["any_eaten"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["energy_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        any_eaten = jnp.any(
            jnp.stack(
                [
                    safe_norm(a.pos(state) - self.goal.pos(state))
                    < a.shape.radius + self.goal.shape.radius
                    for a in self.world.agents
                ],
                axis=1,
            ),
            axis=-1,
        )
        scratch["any_eaten"] = any_eaten
        scratch["done"] = any_eaten
        scratch["pos_rew"] = jnp.where(any_eaten & ~scratch["eaten"], 1.0, 0.0)
        scratch["energy_rew"] = self.energy_coeff * -jnp.stack(
            [
                safe_norm(a.u(state))
                / math.sqrt(
                    self.world.dim_p
                    * float((a.u_range_array[0] * a.u_multiplier_array[0]) ** 2)
                )
                for a in self.world.agents
            ],
            axis=1,
        ).sum(-1)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["pos_rew"] + state.scenario["energy_rew"]

    def post_rewards(self, state):
        scratch = dict(state.scenario)
        eaten = scratch["eaten"] | scratch["any_eaten"]
        scratch["eaten"] = eaten
        rendering = state.rendering.at[:, self.goal.index].set(~eaten)
        return state.replace(scenario=scratch, rendering=rendering)

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.goal.pos(state) - agent.pos(state),
                state.scenario["eaten"].astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "energy_rew": state.scenario["energy_rew"]}

    def done(self, state):
        return state.scenario["done"]
