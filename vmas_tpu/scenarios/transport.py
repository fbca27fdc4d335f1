"""Transport scenario — the north-star benchmark config (BASELINE.json).

Behavioral reference: /root/reference/vmas/scenarios/transport.py:14-190.
N agents push heavy box packages onto a goal; dense shaping reward. The
reference's per-package attributes (on_goal, global_shaping,
transport.py:112-161) are ``[B, P]`` scratch arrays and the ``is_first``
reward block is the pre_rewards hook.
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
        self.n_packages = kwargs.pop("n_packages", 1)
        self.package_width = kwargs.pop("package_width", 0.15)
        self.package_length = kwargs.pop("package_length", 0.15)
        self.package_mass = kwargs.pop("package_mass", 50)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.shaping_factor = 100
        self.world_semidim = 1
        self.agent_radius = 0.03

        world = World(
            batch_dim,
            device,
            x_semidim=self.world_semidim + 2 * self.agent_radius + max(self.package_length, self.package_width),
            y_semidim=self.world_semidim + 2 * self.agent_radius + max(self.package_length, self.package_width),
        )
        for i in range(n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(self.agent_radius), u_multiplier=0.6)
            )
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=0.15), color=Color.LIGHT_GREEN
        )
        world.add_landmark(self.goal)
        self.packages = []
        for i in range(self.n_packages):
            package = Landmark(
                name=f"package {i}",
                collide=True,
                movable=True,
                mass=self.package_mass,
                shape=Box(length=self.package_length, width=self.package_width),
                color=Color.RED,
            )
            package.goal = self.goal
            self.packages.append(package)
            world.add_landmark(package)
        return world

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = ScenarioUtils.spawn_entities_randomly(
            self.world.agents, self.world, state, k1,
            min_dist_between_entities=self.agent_radius * 2,
            x_bounds=(-self.world_semidim, self.world_semidim),
            y_bounds=(-self.world_semidim, self.world_semidim),
        )
        agent_idx = jnp.asarray([a.index for a in self.world.agents])
        agent_occupied = state.pos[:, agent_idx]
        state = ScenarioUtils.spawn_entities_randomly(
            [self.goal] + self.packages, self.world, state, k2,
            min_dist_between_entities=max(
                p.shape.circumscribed_radius() + self.goal.shape.radius + 0.01
                for p in self.packages
            ),
            x_bounds=(-self.world_semidim, self.world_semidim),
            y_bounds=(-self.world_semidim, self.world_semidim),
            occupied_positions=agent_occupied,
        )

        on_goal = jnp.stack(
            [self.world.is_overlapping(state, p, self.goal) for p in self.packages], axis=-1
        )
        global_shaping = (
            jnp.stack(
                [safe_norm(p.pos(state) - self.goal.pos(state)) for p in self.packages], axis=-1
            )
            * self.shaping_factor
        )
        scratch = dict(state.scenario)
        scratch["on_goal"] = on_goal  # [B, P]
        scratch["global_shaping"] = global_shaping  # [B, P]
        scratch["rew"] = jnp.zeros((state.batch_dim,), jnp.float32)
        return state.replace(scenario=scratch)

    # ------------------------------------------------------------------
    def pre_rewards(self, state):
        """The reference's is_first block (transport.py:131-161)."""
        scratch = dict(state.scenario)
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        dist_to_goal = jnp.stack(
            [safe_norm(p.pos(state) - self.goal.pos(state)) for p in self.packages], axis=-1
        )
        on_goal = jnp.stack(
            [self.world.is_overlapping(state, p, self.goal) for p in self.packages], axis=-1
        )
        package_shaping = dist_to_goal * self.shaping_factor
        rew = rew + jnp.where(
            ~on_goal, scratch["global_shaping"] - package_shaping, 0.0
        ).sum(axis=-1)
        scratch["global_shaping"] = package_shaping
        scratch["on_goal"] = on_goal
        scratch["rew"] = rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        obs = [agent.pos(state), agent.vel(state)]
        for i, package in enumerate(self.packages):
            obs.append(package.pos(state) - self.goal.pos(state))
            obs.append(package.pos(state) - agent.pos(state))
            obs.append(package.vel(state))
            obs.append(state.scenario["on_goal"][:, i : i + 1].astype(jnp.float32))
        return jnp.concatenate(obs, axis=-1)

    def done(self, state):
        return jnp.all(state.scenario["on_goal"], axis=-1)
