"""Reverse transport scenario.

Behavioral reference: /root/reference/vmas/scenarios/reverse_transport.py.
Agents spawn INSIDE a hollow box package and push it outward to the goal.
(The reference's duplicated shaping-add at reverse_transport.py:185-189 is a
no-op — global_shaping already equals package_shaping — so a single shaping
term reproduces it.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.package_width = kwargs.pop("package_width", 0.6)
        self.package_length = kwargs.pop("package_length", 0.6)
        self.package_mass = kwargs.pop("package_mass", 50)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.shaping_factor = 100
        world = World(batch_dim, device, contact_margin=6e-3, substeps=5, collision_force=500)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", shape=Sphere(0.03), u_multiplier=0.5))
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=0.09), color=Color.LIGHT_GREEN
        )
        world.add_landmark(self.goal)
        self.package = Landmark(
            name=f"package {n_agents - 1}", collide=True, movable=True,
            mass=self.package_mass,
            shape=Box(length=self.package_length, width=self.package_width, hollow=True),
            color=Color.RED,
        )
        self.package.goal = self.goal
        world.add_landmark(self.package)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3 = jax.random.split(key, 3)
        package_pos = jax.random.uniform(k1, (B, 2), minval=-1.0, maxval=1.0)
        state = self.package.set_pos(state, package_pos)
        for i, agent in enumerate(self.world.agents):
            r = agent.shape.radius
            kx = jax.random.fold_in(k2, i)
            rel = jnp.stack(
                [
                    jax.random.uniform(kx, (B,), minval=-self.package_length / 2 + r,
                                       maxval=self.package_length / 2 - r),
                    jax.random.uniform(jax.random.fold_in(kx, 1), (B,),
                                       minval=-self.package_width / 2 + r,
                                       maxval=self.package_width / 2 - r),
                ],
                axis=-1,
            )
            state = agent.set_pos(state, rel + package_pos)
        state = self.goal.set_pos(state, jax.random.uniform(k3, (B, 2), minval=-1.0, maxval=1.0))

        scratch = dict(state.scenario)
        scratch["global_shaping"] = (
            safe_norm(self.package.pos(state) - self.goal.pos(state)) * self.shaping_factor
        )
        scratch["on_goal"] = jnp.zeros((B,), bool)
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = safe_norm(self.package.pos(state) - self.goal.pos(state))
        on_goal = self.world.is_overlapping(state, self.package, self.goal)
        package_shaping = dist * self.shaping_factor
        scratch["rew"] = jnp.where(~on_goal, scratch["global_shaping"] - package_shaping, 0.0)
        scratch["global_shaping"] = package_shaping
        scratch["on_goal"] = on_goal
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.package.vel(state),
                self.package.pos(state) - agent.pos(state),
                self.package.pos(state) - self.goal.pos(state),
            ],
            axis=-1,
        )

    def done(self, state):
        return state.scenario["on_goal"]
