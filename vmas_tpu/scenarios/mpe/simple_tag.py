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

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs). respawn_at_catch moves caught agents inside
        pre_rewards — a state mutation the emit protocol cannot express —
        so that config falls back to the hook pipeline."""
        if self.respawn_at_catch:
            return None
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        radius = {a.name: float(a.shape.radius) for a in agents}
        shape_agent = bool(self.shape_agent_rew)
        shape_adv = bool(self.shape_adversary_rew)
        share_agents = bool(self.agents_share_rew)
        share_advs = bool(self.adversaries_share_rew)
        same_team = bool(self.observe_same_team)
        obs_pos = bool(self.observe_pos)
        obs_vel = bool(self.observe_vel)
        goods = [a for a in agents if not a.adversary]
        advs = [a for a in agents if a.adversary]

        def obs_struct(agent):
            """(pos_partners, vel_partners) in the hook's iteration order."""
            pos_p, vel_p = [], []
            for other in agents:
                if other is agent:
                    continue
                if agent.adversary and not other.adversary:
                    pos_p.append(other), vel_p.append(other)
                elif not agent.adversary and not other.adversary and same_team:
                    pos_p.append(other), vel_p.append(other)
                elif not agent.adversary and other.adversary:
                    pos_p.append(other)
                elif agent.adversary and other.adversary and same_team:
                    pos_p.append(other)
            return pos_p, vel_p

        structs = [obs_struct(a) for a in agents]
        row_w = [
            (2 if obs_vel else 0) + (2 if obs_pos else 0) + 2 * L
            + 2 * len(p) + 2 * len(v)
            for p, v in structs
        ]
        offs = [sum(row_w[:i]) for i in range(A)]

        class SimpleTagOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = sum(row_w) + A
            carry_extra_idx = ()  # no kernel-read scratch -> rows-rollout eligible

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]

                def collide(a, b):
                    return (
                        F_._norm(
                            px[a.index] - px[b.index], py[a.index] - py[b.index]
                        )
                        < radius[a.name] + radius[b.name]
                    ).astype(jnp.float32)

                rows = []
                for a, (pos_p, vel_p) in zip(agents, structs):
                    ai = a.index
                    if obs_vel:
                        rows += [vx[ai], vy[ai]]
                    if obs_pos:
                        rows += [px[ai], py[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    for b in pos_p:
                        rows += [px[b.index] - px[ai], py[b.index] - py[ai]]
                    for b in vel_p:
                        rows += [vx[b.index], vy[b.index]]

                rews = []
                for a in agents:
                    r = None
                    if a.adversary:
                        if shape_adv:
                            m = None
                            for g in goods:
                                d = F_._norm(
                                    px[g.index] - px[a.index],
                                    py[g.index] - py[a.index],
                                )
                                m = d if m is None else jnp.minimum(m, d)
                            r = -0.1 * m
                        if a.collide:
                            for g in goods:
                                hit = 10.0 * collide(g, a)
                                r = hit if r is None else r + hit
                    else:
                        for adv in advs:
                            if shape_agent:
                                t = 0.1 * F_._norm(
                                    px[a.index] - px[adv.index],
                                    py[a.index] - py[adv.index],
                                )
                                r = t if r is None else r + t
                            if a.collide:
                                t = -10.0 * collide(adv, a)
                                r = t if r is None else r + t
                    rews.append(r if r is not None else jnp.zeros_like(px[0]))
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[offs[i] : offs[i] + row_w[i]].T for i in range(A)
                )
                base = sum(row_w)
                per_agent = jnp.stack(
                    [extra[base + i] for i in range(A)], axis=-1
                )  # [B, A]
                good_mask = jnp.asarray([not a.adversary for a in agents])
                agents_rew = jnp.where(good_mask[None], per_agent, 0.0).sum(-1)
                adv_rew = jnp.where(~good_mask[None], per_agent, 0.0).sum(-1)
                rews = tuple(
                    (adv_rew if share_advs else per_agent[:, i])
                    if a.adversary
                    else (agents_rew if share_agents else per_agent[:, i])
                    for i, a in enumerate(agents)
                )
                done = jnp.zeros((state.batch_dim,), bool)
                updates = {
                    "per_agent_rew": per_agent,
                    "agents_rew": agents_rew,
                    "adversary_rew": adv_rew,
                }
                return obs, rews, done, updates

        return SimpleTagOutputs()
