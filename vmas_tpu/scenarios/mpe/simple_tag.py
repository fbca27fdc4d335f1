"""MPE simple_tag (predator-prey).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_tag.py.
Per-agent rewards are computed in pre_rewards (the reference's is_first block,
simple_tag.py:118-152); respawn_at_catch draws randomness from a PRNG key kept
in scenario scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        num_good_agents = kwargs.pop("num_good_agents", 1)
        num_adversaries = kwargs.pop("num_adversaries", 3)
        num_landmarks = kwargs.pop("num_landmarks", 2)
        self.shape_agent_rew = kwargs.pop("shape_agent_rew", False)
        self.shape_adversary_rew = kwargs.pop("shape_adversary_rew", False)
        self.agents_share_rew = kwargs.pop("agents_share_rew", False)
        self.adversaries_share_rew = kwargs.pop("adversaries_share_rew", True)
        self.observe_same_team = kwargs.pop("observe_same_team", True)
        self.observe_pos = kwargs.pop("observe_pos", True)
        self.observe_vel = kwargs.pop("observe_vel", True)
        self.bound = kwargs.pop("bound", 1.0)
        self.respawn_at_catch = kwargs.pop("respawn_at_catch", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.visualize_semidims = False
        world = World(
            batch_dim=batch_dim, device=device,
            x_semidim=self.bound, y_semidim=self.bound,
            substeps=10, collision_force=500,
        )
        self.adversary_radius = 0.075
        for i in range(num_adversaries + num_good_agents):
            adversary = i < num_adversaries
            name = f"adversary_{i}" if adversary else f"agent_{i - num_adversaries}"
            world.add_agent(
                Agent(
                    name=name, collide=True,
                    shape=Sphere(radius=self.adversary_radius if adversary else 0.05),
                    u_multiplier=3.0 if adversary else 4.0,
                    max_speed=1.0 if adversary else 1.3,
                    color=Color.RED if adversary else Color.GREEN,
                    adversary=adversary,
                )
            )
        for i in range(num_landmarks):
            world.add_landmark(
                Landmark(name=f"landmark {i}", collide=True, shape=Sphere(radius=0.2), color=Color.BLACK)
            )
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state,
                jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=-self.bound, maxval=self.bound),
            )
        for i, lm in enumerate(self.world.landmarks):
            state = lm.set_pos(
                state,
                jax.random.uniform(
                    jax.random.fold_in(key, 1000 + i), (B, 2),
                    minval=-(self.bound - 0.1), maxval=self.bound - 0.1,
                ),
            )
        scratch = dict(state.scenario)
        scratch["rng"] = jax.random.fold_in(key, 999_999)
        scratch["agents_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["adversary_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["per_agent_rew"] = jnp.zeros((B, len(self.world.agents)), jnp.float32)
        return state.replace(scenario=scratch)

    def is_collision(self, state, a, b):
        dist = safe_norm(a.pos(state) - b.pos(state))
        return dist < (a.shape.radius + b.shape.radius)

    def good_agents(self):
        return [a for a in self.world.agents if not a.adversary]

    def adversaries(self):
        return [a for a in self.world.agents if a.adversary]

    def _agent_reward(self, state, agent):
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        for adv in self.adversaries():
            if self.shape_agent_rew:
                rew = rew + 0.1 * safe_norm(agent.pos(state) - adv.pos(state))
            if agent.collide:
                rew = rew - 10.0 * self.is_collision(state, adv, agent).astype(jnp.float32)
        return rew

    def _adversary_reward(self, state, agent):
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        agents = self.good_agents()
        if self.shape_adversary_rew:
            rew = rew - 0.1 * jnp.min(
                jnp.stack([safe_norm(a.pos(state) - agent.pos(state)) for a in agents], axis=-1),
                axis=-1,
            )
        if agent.collide:
            for ag in agents:
                rew = rew + 10.0 * self.is_collision(state, ag, agent).astype(jnp.float32)
        return rew

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        per_agent = []
        for a in self.world.agents:
            per_agent.append(
                self._adversary_reward(state, a) if a.adversary else self._agent_reward(state, a)
            )
        per_agent = jnp.stack(per_agent, axis=-1)  # [B, A]
        good_mask = jnp.asarray([not a.adversary for a in self.world.agents])
        scratch["per_agent_rew"] = per_agent
        scratch["agents_rew"] = jnp.where(good_mask[None], per_agent, 0.0).sum(-1)
        scratch["adversary_rew"] = jnp.where(~good_mask[None], per_agent, 0.0).sum(-1)

        if self.respawn_at_catch:
            rng = scratch["rng"]
            for a in self.good_agents():
                caught = jnp.zeros((state.batch_dim,), bool)
                for adv in self.adversaries():
                    caught = caught | self.is_collision(state, a, adv)
                rng, sub = jax.random.split(rng)
                new_pos = jax.random.uniform(
                    sub, (state.batch_dim, 2), minval=-self.bound, maxval=self.bound
                )
                state = a.set_pos(state, new_pos, env_mask=caught)
                state = a.set_vel(state, jnp.zeros((state.batch_dim, 2)), env_mask=caught)
            scratch["rng"] = rng
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        if agent.adversary:
            return s["adversary_rew"] if self.adversaries_share_rew else s["per_agent_rew"][:, agent.slot]
        return s["agents_rew"] if self.agents_share_rew else s["per_agent_rew"][:, agent.slot]

    def observation(self, agent, state):
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        other_pos, other_vel = [], []
        for other in self.world.agents:
            if other is agent:
                continue
            if agent.adversary and not other.adversary:
                other_pos.append(other.pos(state) - agent.pos(state))
                other_vel.append(other.vel(state))
            elif not agent.adversary and not other.adversary and self.observe_same_team:
                other_pos.append(other.pos(state) - agent.pos(state))
                other_vel.append(other.vel(state))
            elif not agent.adversary and other.adversary:
                other_pos.append(other.pos(state) - agent.pos(state))
            elif agent.adversary and other.adversary and self.observe_same_team:
                other_pos.append(other.pos(state) - agent.pos(state))
        return jnp.concatenate(
            [
                *([agent.vel(state)] if self.observe_vel else []),
                *([agent.pos(state)] if self.observe_pos else []),
                *entity_pos,
                *other_pos,
                *other_vel,
            ],
            axis=-1,
        )

    def extra_render(self, env, ax, env_index: int = 0):
        """Arena perimeter (reference mpe/simple_tag.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_perimeter(ax, self.bound, pad=self.adversary_radius)
