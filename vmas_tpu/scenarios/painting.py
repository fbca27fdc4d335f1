"""Painting scenario (fork-only DOTS: knowledge mixing + comms).

Behavioral reference: /root/reference/vmas/scenarios/painting.py. Per-agent
knowledge [B, 2, K], per-goal expected knowledge [B, K], seeking flags, and
shaping baselines live in scratch via the DOTS handles; the seaborn "Set2"
palette is inlined (painting.py:24-27) to avoid the dependency.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vmas_tpu.core import Box, Color, Sphere
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.dots_core import DOTSAgent, DOTSComsNetwork, DOTSPayloadDest, DOTSWorld
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils

# seaborn Set2 palette (8 colors)
SET2 = jnp.asarray(
    [
        [0.4, 0.7607843137254902, 0.6470588235294118],
        [0.9882352941176471, 0.5529411764705883, 0.3843137254901961],
        [0.5529411764705883, 0.6274509803921569, 0.796078431372549],
        [0.9058823529411765, 0.5411764705882353, 0.7647058823529411],
        [0.6509803921568628, 0.8470588235294118, 0.32941176470588235],
        [1.0, 0.8509803921568627, 0.1843137254901961],
        [0.8980392156862745, 0.7686274509803922, 0.5803921568627451],
        [0.7019607843137254, 0.7019607843137254, 0.7019607843137254],
    ],
    jnp.float32,
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.task_type = kwargs.get("task_type", "nav")
        self.n_agents = kwargs.get("n_agents", 4)
        self.n_goals = kwargs.get("n_goals", 4)
        self.agent_radius = 0.2
        self.arena_size = 5
        self.viewer_zoom = 1.7
        self.knowledge_shape = kwargs.get("knowledge_shape", (2, 3))
        self.multi_head = kwargs.get("multi_head", False)
        self.observation_proximity = kwargs.get("observation_proximity", self.arena_size)
        self.observe_all_goals = kwargs.get("observe_all_goals", False)
        self.observe_other_agents = kwargs.get("observe_other_agents", True)
        self.isolated_coms = kwargs.get("isolated_coms", False)
        self.coms_proximity = kwargs.get("coms_proximity", self.arena_size)
        self.learn_coms = kwargs.get("learn_coms", True)
        self.mixing_thresh = kwargs.get("mixing_thresh", 0.01)
        self.learn_mix = kwargs.get("learn_mix", True)
        self.dim_c = (
            kwargs.get("dim_c", 1 + self.knowledge_shape[1]) if self.task_type != "nav" else 0
        )
        self.agent_action_size = kwargs.get("action_size", 2 + self.knowledge_shape[1])

        world = DOTSWorld(batch_dim, device, collision_force=100, dim_c=self.dim_c)
        self.agent_list = []
        name_ext = ["nav_", "mix_"] if self.multi_head else [""]
        for ext in name_ext:
            for i in range(self.n_agents):
                agent = DOTSAgent(
                    name=f"{ext}agent_{i}",
                    shape=Sphere(self.agent_radius),
                    color=Color.GREEN,
                    knowledge_shape=self.knowledge_shape,
                    silent=True if self.dim_c == 0 else False,
                    action_size=self.agent_action_size,
                )
                self.agent_list.append(agent)
                world.add_agent(agent)

        self.coms_network = None
        if self.isolated_coms:
            self.coms_network = DOTSComsNetwork(
                name="coms_network", action_size=self.dim_c * self.n_agents
            )
            world.add_agent(self.coms_network)

        self.goals = []
        for i in range(self.n_goals):
            goal = DOTSPayloadDest(
                name=f"goal_{i}", collide=False,
                shape=Box(length=self.agent_radius * 4, width=self.agent_radius * 4),
                color=Color.BLUE, expected_knowledge_shape=3,
            )
            self.goals.append(goal)
            world.add_landmark(goal)

        world.spawn_map()

        self.agent_collision_penalty = kwargs.get("agent_collision_penalty", -0.2)
        self.env_collision_penalty = kwargs.get("env_collision_penalty", -0.2)
        self.min_collision_distance = kwargs.get("collision_dist", 0.005)
        self.pos_shaping = kwargs.get("pos_shaping", False)
        self.pos_shaping_factor = kwargs.get("pos_shaping_factor", 1.0)
        self.mix_shaping = kwargs.get("mix_shaping", False)
        self.mix_shaping_factor = kwargs.get("mix_shaping_factor", 1.0)
        self.all_on_goal = kwargs.get("final_pos_reward", 0.05)
        self.all_mixed = kwargs.get("final_mix_reward", 0.05)
        self.per_agent_reward = kwargs.get("per_agent_reward", False)
        return world

    # ------------------------------------------------------------------
    def random_paint_generator(self, state, key):
        """Reference painting.py:164-246."""
        B = state.batch_dim
        if self.task_type == "nav":
            n = max(self.n_agents, self.n_goals)
            # per-env random selection of n distinct Set2 colors
            perm = jax.random.permutation(
                key, jnp.broadcast_to(jnp.arange(SET2.shape[0]), (B, SET2.shape[0])),
                axis=1, independent=True,
            )
            colors = SET2[perm[:, :n]]  # [B, n, 3]
            return colors, colors  # (agent_knowledge, goal_knowledge) share colors
        # unmixed: linear RGB ramp for agents, random colors for goals
        t = np.linspace(-510, 510, self.n_agents)
        ramp = np.round(np.clip(np.stack([-t, 510 - np.abs(t), t], axis=1), 0, 255)).astype(
            np.float32
        ) / 255
        agent_knowledge = jnp.broadcast_to(jnp.asarray(ramp)[None], (B, self.n_agents, 3))
        goal_knowledge = jax.random.uniform(key, (B, self.n_goals, 3), minval=0.01, maxval=1.0)
        return agent_knowledge, goal_knowledge

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        state = ScenarioUtils.spawn_entities_randomly(
            self.agent_list + self.goals, self.world, state, k1,
            min_dist_between_entities=1,
            x_bounds=(int(-self.arena_size / 2), int(self.arena_size / 2)),
            y_bounds=(int(-self.arena_size / 2), int(self.arena_size / 2)),
        )
        for a in self.agent_list:
            state = a.spawn_dots_state(state)
        for g in self.goals:
            state = g.spawn_dots_state(state)

        agent_knowledge, goal_knowledge = self.random_paint_generator(state, k2)
        for i, agent in enumerate(self.agent_list):
            k = jnp.repeat(agent_knowledge[:, i % self.n_agents, None, :], 2, axis=1)
            state = agent.set_knowledge(state, k)
        for i, goal in enumerate(self.goals):
            state = goal.set_expected_knowledge(state, goal_knowledge[:, i % self.n_goals, :])

        scratch = dict(state.scenario)
        A, G = len(self.agent_list), self.n_goals
        shaping = jnp.stack(
            [
                jnp.stack(
                    [safe_norm(a.pos(state) - g.pos(state)) for g in self.goals], axis=-1
                )
                for a in self.agent_list
            ],
            axis=1,
        ) * self.pos_shaping_factor  # [B, A, G]
        mix_shaping = jnp.stack(
            [
                jnp.stack(
                    [
                        safe_norm(a.knowledge(state)[:, 1, :] - g.expected_knowledge(state))
                        for g in self.goals
                    ],
                    axis=-1,
                )
                for a in self.agent_list
            ],
            axis=1,
        ) * self.mix_shaping_factor
        scratch["shaping"] = shaping
        scratch["pos_shape_norm"] = shaping
        scratch["mix_shaping"] = mix_shaping
        scratch["mix_shaping_norm"] = mix_shaping
        for k in ["final_rew", "final_pos_rew", "final_mix_rew"]:
            scratch[k] = jnp.zeros((B,), jnp.float32)
        scratch["agent_pos_reward"] = jnp.zeros((B, A), jnp.float32)
        scratch["agent_mixing_reward"] = jnp.zeros((B, A), jnp.float32)
        scratch["agent_collision_rew"] = jnp.zeros((B, A), jnp.float32)
        scratch["obstacle_collision_rew"] = jnp.zeros((B, A), jnp.float32)
        scratch["agent_final_reward"] = jnp.zeros((B, A), jnp.float32)
        state = state.replace(scenario=scratch)
        return self.world.reset_map(state)

    # ------------------------------------------------------------------
    def process_action(self, agent, state):
        if self.task_type != "nav" and agent in self.agent_list:
            state = self.mix_knowledge(state, agent)
        return state

    def mix_knowledge(self, state, agent):
        """Reference painting.py:584-662."""
        i = self.agent_list.index(agent)
        kdims = self.knowledge_shape[-1]
        others = [a for a in self.agent_list if a is not agent]

        comm = state.uc[:, agent.slot]  # agent's comm action
        request_mix = (comm[:, 0] > 0.5) & ~agent.seeking_goal(state)
        in_prox = (
            jnp.stack([safe_norm(agent.pos(state) - o.pos(state)) for o in others], axis=0)
            < self.coms_proximity
        ) & request_mix[None]
        any_in_prox = jnp.zeros_like(request_mix)
        for r in in_prox:
            any_in_prox = any_in_prox | r

        new_mix = agent.knowledge(state)[:, 1, :]
        if self.learn_mix:
            mix_coeff = (agent.u(state)[:, -kdims:] + 1) / 2
        else:
            mix_coeff = self.goals[i % self.n_goals].expected_knowledge(state)

        if self.learn_coms:
            if self.isolated_coms:
                coms_index = i * self.knowledge_shape[1]
                com_knowledge = (
                    self.coms_network.u(state)[:, coms_index : coms_index + kdims] + 1
                ) / 2
            else:
                # reference reads other.state.c — the comm STATE, i.e. the
                # previous step's broadcast (painting.py:630-632), not the
                # in-flight comm action
                com_knowledge = jnp.stack([state.c[:, o.slot, 1:] for o in others], axis=0)
        else:
            com_knowledge = jnp.stack([o.knowledge(state)[:, 0, :] for o in others], axis=0)

        if self.isolated_coms:
            new_mix = com_knowledge * mix_coeff
        else:
            for r in in_prox:
                new_mix = jnp.where(r[:, None], 0.0, new_mix)
            for k, r in enumerate(in_prox):
                new_mix = new_mix + jnp.where(r[:, None], com_knowledge[k] * mix_coeff, 0.0)
            new_mix = new_mix + jnp.where(
                any_in_prox[:, None], agent.knowledge(state)[:, 0, :] * mix_coeff, 0.0
            )

        knowledge = agent.knowledge(state).at[:, 1, :].set(new_mix)
        return agent.set_knowledge(state, knowledge)

    # ------------------------------------------------------------------
    def pre_rewards(self, state):
        """Reference reward() bookkeeping (painting.py:418-558)."""
        scratch = dict(state.scenario)
        B = state.batch_dim
        A = len(self.agent_list)
        G = self.n_goals

        a_idx = jnp.asarray([a.index for a in self.agent_list])
        g_idx = jnp.asarray([g.index for g in self.goals])
        a_pos = state.pos[:, a_idx]
        g_pos = state.pos[:, g_idx]
        dists = safe_norm(a_pos[:, :, None] - g_pos[:, None])  # [B, A, G]
        learnt = jnp.stack([a.knowledge(state)[:, 1, :] for a in self.agent_list], axis=1)
        expected = jnp.stack([g.expected_knowledge(state) for g in self.goals], axis=1)
        colour_match = (
            safe_norm(learnt[:, :, None] - expected[:, None]) < self.mixing_thresh
        )  # [B, A, G]

        pos_reward = jnp.zeros((B, A), jnp.float32)
        if self.task_type != "mix":
            if self.pos_shaping:
                pos_shaping = dists * self.pos_shaping_factor
                shaped = (scratch["shaping"] - pos_shaping) / scratch["pos_shape_norm"]
                scratch["shaping"] = pos_shaping
                pos_reward = (shaped * colour_match).sum(-1)
            matched_dists = jnp.abs((dists * colour_match).sum(-1))  # [B, A]
            on_goal = (0 < matched_dists) == (matched_dists < self.agent_radius / 2)
            final_reward = jnp.where(on_goal, self.all_on_goal / self.n_agents, 0.0)
        else:
            final_reward = jnp.zeros((B, A), jnp.float32)
        scratch["agent_pos_reward"] = pos_reward
        scratch["agent_final_reward"] = final_reward

        mixing_reward = jnp.zeros((B, A), jnp.float32)
        if self.task_type != "nav":
            for i, agent in enumerate(self.agent_list):
                gi = i % self.n_goals
                kd = safe_norm(learnt[:, i] - expected[:, gi])
                seeking = agent.seeking_goal(state) | (kd < self.mixing_thresh)
                state = agent.set_seeking_goal(state, seeking)
                if self.mix_shaping:
                    ms = kd * self.mix_shaping_factor
                    shaped = (scratch["mix_shaping"][:, i, gi] - ms) / scratch["mix_shaping_norm"][:, i, gi]
                    scratch["mix_shaping"] = scratch["mix_shaping"].at[:, i, gi].set(ms)
                    mixing_reward = mixing_reward.at[:, i].add(shaped)
            scratch = {**dict(state.scenario), **scratch}
        scratch["agent_mixing_reward"] = mixing_reward

        # collisions
        coll_a = jnp.zeros((B, A), jnp.float32)
        coll_o = jnp.zeros((B, A), jnp.float32)
        for i, agent in enumerate(self.agent_list):
            if self.agent_collision_penalty != 0:
                for a in self.agent_list:
                    if a is not agent:
                        hit = self.world.get_distance(state, agent, a) <= self.min_collision_distance
                        coll_a = coll_a.at[:, i].add(self.agent_collision_penalty * hit.astype(jnp.float32))
            if self.env_collision_penalty != 0:
                for lm in self.world.walls:
                    if self.world.collides(agent, lm):
                        hit = self.world.get_distance(state, agent, lm) <= self.min_collision_distance
                        coll_o = coll_o.at[:, i].add(self.env_collision_penalty * hit.astype(jnp.float32))
        scratch["agent_collision_rew"] = coll_a
        scratch["obstacle_collision_rew"] = coll_o

        # final rewards (last-agent block, painting.py:432-472)
        final_rew = jnp.zeros((B,), jnp.float32)
        if self.task_type != "mix":
            final_pos = final_reward.sum(-1)
            if self.per_agent_reward:
                final_rew = final_rew + final_pos
            else:
                final_pos = jnp.where(final_pos < self.all_on_goal, 0.0, final_pos)
                final_rew = final_rew + jnp.where(final_pos > 0, self.all_on_goal, 0.0)
            scratch["final_pos_rew"] = final_pos
        if self.task_type != "nav":
            seeking = jnp.stack([a.seeking_goal(state) for a in self.agent_list], axis=-1)
            final_mix = (seeking.astype(jnp.float32) * (self.all_mixed / self.n_agents)).sum(-1)
            if self.per_agent_reward:
                final_rew = final_rew + final_mix
            else:
                final_mix = jnp.where(final_mix < self.all_mixed, 0.0, final_mix)
                final_rew = final_rew + jnp.where(final_mix > 0, self.all_mixed, 0.0)
            scratch["final_mix_rew"] = final_mix
        scratch["final_rew"] = final_rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        if agent is self.coms_network:
            return s["final_rew"]
        i = self.agent_list.index(agent)
        return (
            s["agent_pos_reward"][:, i]
            + s["agent_mixing_reward"][:, i]
            + s["obstacle_collision_rew"][:, i]
            + s["agent_collision_rew"][:, i]
            + s["final_rew"]
        )

    # ------------------------------------------------------------------
    def observation(self, agent, state):
        if isinstance(agent, DOTSComsNetwork):
            agent_coms = [state.c[:, a.slot] for a in self.agent_list]
            return jnp.concatenate(agent_coms, axis=-1)

        others = (
            jnp.stack(
                [safe_norm(agent.pos(state) - a.pos(state)) for a in self.agent_list if a is not agent],
                axis=1,
            )
            if self.observe_other_agents
            else jnp.zeros((state.batch_dim, 0))
        )
        task_obs = [self._goal_observations(state, agent)]
        if self.task_type != "nav":
            self._coms_observations(state, agent, task_obs)
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                agent.knowledge(state)[:, 0, :],
                agent.knowledge(state)[:, 1, :],
                *task_obs,
                others,
            ],
            axis=-1,
        )

    def _coms_observations(self, state, agent, task_obs):
        """Reference painting.py:350-375."""
        if self.isolated_coms:
            i = self.agent_list.index(agent)
            start = self.dim_c * i
            task_obs.append(self.coms_network.u(state)[:, start : start + self.dim_c])
        else:
            if self.learn_coms:
                coms = [state.c[:, a.slot] for a in self.agent_list if a is not agent]
            else:
                coms = [a.knowledge(state)[:, 0, :] for a in self.agent_list if a is not agent]
            task_obs.extend(coms)

    def _goal_observations(self, state, agent):
        """Reference painting.py:381-415."""
        if self.observe_all_goals:
            return jnp.concatenate(
                [
                    jnp.concatenate(
                        [g.pos(state) - agent.pos(state), g.expected_knowledge(state)], axis=-1
                    )
                    for g in self.goals
                ],
                axis=-1,
            )
        i = self.agent_list.index(agent) % self.n_goals
        goal = self.goals[i]
        if self.task_type == "mix":
            return goal.expected_knowledge(state) - agent.knowledge(state)[:, 1, :]
        return jnp.concatenate(
            [goal.pos(state) - agent.pos(state), goal.expected_knowledge(state)], axis=-1
        )

    def done(self, state):
        return jnp.zeros((state.batch_dim,), bool)

    def info(self, agent, state):
        s = state.scenario
        if isinstance(agent, DOTSComsNetwork):
            return {"final_rew": s["final_rew"]}
        i = self.agent_list.index(agent)
        return {
            "pos_reward": s["agent_pos_reward"][:, i],
            "mix_reward": s["agent_mixing_reward"][:, i],
            "final_rew": s["final_rew"],
        }

    def top_layer_render(self, env, ax, env_index: int = 0):
        """Knowledge visualization on top of the entity layer (reference
        painting.py top_layer_render): each goal shows its expected-knowledge
        color as a patch, each agent shows its primary/mixed knowledge as two
        half-discs, and agents that have matched a goal get a yellow ring."""
        import numpy as np

        from vmas_tpu.render import draw

        state = env.state
        pos = np.asarray(state.pos[env_index])
        for goal in self.goals:
            col = np.clip(np.asarray(goal.expected_knowledge(state)[env_index]), 0, 1)
            p = pos[goal.index]
            draw.draw_rect(
                ax, (p[0] - goal.shape.width / 8, p[1]),
                goal.shape.width / 4, goal.shape.length / 2, 0.0, col, zorder=4,
            )
        for agent in self.agent_list:
            p = pos[agent.index]
            if bool(np.asarray(agent.seeking_goal(state)[env_index])):
                draw.draw_circle(ax, p, self.agent_radius, (1, 1, 0), filled=True,
                                 zorder=4)
            know = np.clip(np.asarray(agent.knowledge(state)[env_index]), 0, 1)
            # primary on the upper half-disc, mixed on the lower (the
            # reference's two proportion=0.5 circles rotated +-pi/2)
            draw.draw_wedge(ax, p, self.agent_radius / 2, 0, np.pi, know[0],
                            zorder=5)
            draw.draw_wedge(ax, p, self.agent_radius / 2, np.pi, 2 * np.pi,
                            know[1], zorder=5)
