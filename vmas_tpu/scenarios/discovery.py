"""Discovery scenario (cover targets with k agents; targets respawn).

Behavioral reference: /root/reference/vmas/scenarios/discovery.py. Target
respawns (the reference's is_last block, discovery.py:180-210) happen in
post_rewards using a PRNG key held in scratch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.sensors import Lidar
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 5)
        self.n_targets = kwargs.pop("n_targets", 7)
        self.x_semidim = kwargs.pop("x_semidim", 1)
        self.y_semidim = kwargs.pop("y_semidim", 1)
        self._min_dist_between_entities = kwargs.pop("min_dist_between_entities", 0.2)
        self._lidar_range = kwargs.pop("lidar_range", 0.35)
        self._covering_range = kwargs.pop("covering_range", 0.25)
        self.use_agent_lidar = kwargs.pop("use_agent_lidar", False)
        self.n_lidar_rays_entities = kwargs.pop("n_lidar_rays_entities", 15)
        self.n_lidar_rays_agents = kwargs.pop("n_lidar_rays_agents", 12)
        self._agents_per_target = kwargs.pop("agents_per_target", 2)
        self.targets_respawn = kwargs.pop("targets_respawn", True)
        self.shared_reward = kwargs.pop("shared_reward", False)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", 0)
        self.covering_rew_coeff = kwargs.pop("covering_rew_coeff", 1.0)
        self.time_penalty = kwargs.pop("time_penalty", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self._comms_range = self._lidar_range
        self.min_collision_distance = 0.005
        self.agent_radius = 0.05
        self.target_radius = self.agent_radius
        self.viewer_zoom = 1
        self.target_color = Color.GREEN

        world = World(
            batch_dim, device, x_semidim=self.x_semidim, y_semidim=self.y_semidim,
            collision_force=500, substeps=2, drag=0.25,
        )
        entity_filter_agents = lambda e: e.name.startswith("agent")
        entity_filter_targets = lambda e: e.name.startswith("target")
        for i in range(self.n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}", collide=True, shape=Sphere(radius=self.agent_radius),
                    sensors=(
                        [
                            Lidar(
                                world, n_rays=self.n_lidar_rays_entities,
                                max_range=self._lidar_range,
                                entity_filter=entity_filter_targets, render_color=Color.GREEN,
                            )
                        ]
                        + (
                            [
                                Lidar(
                                    world, angle_start=0.05, angle_end=2 * math.pi + 0.05,
                                    n_rays=self.n_lidar_rays_agents, max_range=self._lidar_range,
                                    entity_filter=entity_filter_agents, render_color=Color.BLUE,
                                )
                            ]
                            if self.use_agent_lidar
                            else []
                        )
                    ),
                )
            )
        self._targets = []
        for i in range(self.n_targets):
            target = Landmark(
                name=f"target_{i}", collide=True, movable=False,
                shape=Sphere(radius=self.target_radius), color=self.target_color,
            )
            world.add_landmark(target)
            self._targets.append(target)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        state = ScenarioUtils.spawn_entities_randomly(
            self._targets + self.world.agents, self.world, state, k1,
            self._min_dist_between_entities,
            x_bounds=(-self.x_semidim, self.x_semidim),
            y_bounds=(-self.y_semidim, self.y_semidim),
        )
        scratch = dict(state.scenario)
        scratch["all_time_covered"] = jnp.zeros((B, self.n_targets), bool)
        scratch["rng"] = k2
        scratch["covered_targets"] = jnp.zeros((B, self.n_targets), bool)
        scratch["covering_rew"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["shared_covering_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["collision_rew"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["time_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def _dists(self, state):
        a_idx = jnp.asarray([a.index for a in self.world.agents])
        t_idx = jnp.asarray([t.index for t in self._targets])
        a_pos = state.pos[:, a_idx]  # [B, A, 2]
        t_pos = state.pos[:, t_idx]  # [B, T, 2]
        return safe_norm(a_pos[:, :, None, :] - t_pos[:, None, :, :])  # [B, A, T]

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        B = state.batch_dim
        dists = self._dists(state)
        in_range = dists < self._covering_range  # [B, A, T]
        agents_per_target = in_range.sum(axis=1)  # [B, T]
        covered = agents_per_target >= self._agents_per_target
        scratch["covered_targets"] = covered
        scratch["time_rew"] = jnp.full((B,), float(self.time_penalty), jnp.float32)

        covering_rew = (
            (in_range & covered[:, None, :]).sum(-1).astype(jnp.float32) * self.covering_rew_coeff
        )  # [B, A]
        scratch["covering_rew"] = covering_rew
        shared = covering_rew.sum(-1)
        scratch["shared_covering_rew"] = jnp.where(shared != 0, shared / 2, shared)

        coll = jnp.zeros((B, self.n_agents), jnp.float32)
        if self.agent_collision_penalty != 0:
            # all agents are spheres: one batched [B, A, A] pairwise distance
            # replaces the reference's O(A^2) get_distance loop
            a_idx = jnp.asarray([a.index for a in self.world.agents])
            a_pos = state.pos[:, a_idx]  # [B, A, 2]
            radii = jnp.asarray(
                [a.shape.radius for a in self.world.agents], jnp.float32
            )
            d = (
                safe_norm(a_pos[:, :, None, :] - a_pos[:, None, :, :])
                - radii[None, :, None] - radii[None, None, :]
            )
            hit = (d < self.min_collision_distance) & ~jnp.eye(self.n_agents, dtype=bool)[None]
            coll = self.agent_collision_penalty * hit.sum(-1).astype(jnp.float32)
        scratch["collision_rew"] = coll
        return state.replace(scenario=scratch)

    def post_rewards(self, state):
        """Target respawn / removal (reference is_last block)."""
        scratch = dict(state.scenario)
        covered = scratch["covered_targets"]
        B = state.batch_dim
        rng = scratch["rng"]
        if self.targets_respawn:
            a_idx = jnp.asarray([a.index for a in self.world.agents])
            agents_pos = state.pos[:, a_idx]
            for i, target in enumerate(self._targets):
                others = jnp.stack(
                    [o.pos(state) for o in self._targets if o is not target], axis=1
                )
                occupied = jnp.concatenate([agents_pos, others], axis=1)
                rng, sub = jax.random.split(rng)
                pos = ScenarioUtils.find_random_pos_for_entity_vectorized(
                    occupied, sub, self.world, self._min_dist_between_entities,
                    (-self.x_semidim, self.x_semidim), (-self.y_semidim, self.y_semidim),
                )
                state = target.set_pos(state, pos[:, 0], env_mask=covered[:, i])
        else:
            scratch["all_time_covered"] = scratch["all_time_covered"] | covered
            rng, sub = jax.random.split(rng)
            outside = jax.random.uniform(
                sub, (B, 2), minval=-1000 * self.x_semidim, maxval=-10 * self.x_semidim
            )
            for i, target in enumerate(self._targets):
                state = target.set_pos(state, outside, env_mask=covered[:, i])
        scratch["rng"] = rng
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        covering = (
            s["shared_covering_rew"] if self.shared_reward else s["covering_rew"][:, agent.slot]
        )
        return s["collision_rew"][:, agent.slot] + covering + s["time_rew"]

    def observation(self, agent, state):
        obs = [agent.pos(state), agent.vel(state), agent.sensors[0].measure(state)]
        if self.use_agent_lidar:
            obs.append(agent.sensors[1].measure(state))
        return jnp.concatenate(obs, axis=-1)

    def info(self, agent, state):
        s = state.scenario
        return {
            "covering_reward": (
                s["shared_covering_rew"] if self.shared_reward else s["covering_rew"][:, agent.slot]
            ),
            "collision_rew": s["collision_rew"][:, agent.slot],
            "targets_covered": s["covered_targets"].sum(-1),
        }

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). The A*T covering matrix and reward shares run
        in-kernel; the REAL post_rewards hook still performs the target
        respawn on the unpacked covered_targets, and the Lidar is appended
        in finish_obs AFTER that respawn (the non-fused hook order — a
        covered target must be observed at its post-respawn position)."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        targets = self._targets
        A, T = len(agents), len(targets)
        cover_r = float(self._covering_range)
        per_target = int(self._agents_per_target)
        coeff = float(self.covering_rew_coeff)
        time_pen = float(self.time_penalty)
        coll_pen = float(self.agent_collision_penalty)
        min_coll = float(self.min_collision_distance)
        radii = [float(a.shape.radius) for a in agents]
        shared = bool(self.shared_reward)
        use_agent_lidar = bool(self.use_agent_lidar)

        class DiscoveryOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = 4 * A + A + T + 1 + (A if coll_pen != 0 else 0)

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]

                in_range = {}
                for ai, a in enumerate(agents):
                    for ti, t in enumerate(targets):
                        in_range[(ai, ti)] = (
                            F_._norm(
                                px[a.index] - px[t.index],
                                py[a.index] - py[t.index],
                            )
                            < cover_r
                        )
                covered = []
                for ti in range(T):
                    n = sum(
                        in_range[(ai, ti)].astype(jnp.float32) for ai in range(A)
                    )
                    covered.append(n >= float(per_target))
                covering = []
                for ai in range(A):
                    n = sum(
                        (in_range[(ai, ti)] & covered[ti]).astype(jnp.float32)
                        for ti in range(T)
                    )
                    covering.append(n * coeff)
                shared_rew = sum(covering)
                shared_rew = jnp.where(
                    shared_rew != 0, shared_rew / 2, shared_rew
                )

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                rows += covering
                rows += [c.astype(jnp.float32) for c in covered]
                rows.append(shared_rew)
                if coll_pen != 0:
                    for i in range(A):
                        c = jnp.zeros_like(px[0])  # stays zero when A == 1
                        for j in range(A):
                            if j == i:
                                continue
                            d = (
                                F_._norm(
                                    px[agents[i].index] - px[agents[j].index],
                                    py[agents[i].index] - py[agents[j].index],
                                )
                                - radii[i] - radii[j]
                            )
                            c = c + (d < min_coll).astype(jnp.float32)
                        rows.append(c * coll_pen)
                return rows

            @staticmethod
            def unpack(extra, state):
                B = state.batch_dim
                covering = extra[4 * A : 5 * A].T               # [B, A]
                covered = extra[5 * A : 5 * A + T].T > 0.5      # [B, T]
                shared_rew = extra[5 * A + T]
                if coll_pen != 0:
                    coll = extra[5 * A + T + 1 : 5 * A + T + 1 + A].T
                else:
                    coll = jnp.zeros((B, A), jnp.float32)
                time_rew = jnp.full((B,), time_pen, jnp.float32)
                # Lidar is NOT measured here: unpack sees the
                # pre-post_rewards state, and covered targets respawn in
                # post_rewards. finish_obs appends it afterwards.
                obs = tuple(extra[i * 4 : (i + 1) * 4].T for i in range(A))
                rews = tuple(
                    coll[:, i]
                    + (shared_rew if shared else covering[:, i])
                    + time_rew
                    for i in range(A)
                )
                done = jnp.zeros((B,), bool)
                updates = {
                    "covered_targets": covered,
                    "covering_rew": covering,
                    "shared_covering_rew": shared_rew,
                    "collision_rew": coll,
                    "time_rew": time_rew,
                }
                return obs, rews, done, updates

            @staticmethod
            def finish_obs(obs, state):
                out = []
                for o, a in zip(obs, agents):
                    parts = [o, a.sensors[0].measure(state)]
                    if use_agent_lidar:
                        parts.append(a.sensors[1].measure(state))
                    out.append(jnp.concatenate(parts, -1))
                return tuple(out)

        return DiscoveryOutputs()

    def extra_render(self, env, ax, env_index: int = 0):
        """Target covering-range circles + agent communication lines
        (reference discovery.py extra_render)."""
        import numpy as np

        from vmas_tpu.core.utils import Color
        from vmas_tpu.render import draw

        pos = np.asarray(env.state.pos[env_index])
        for target in self._targets:
            draw.draw_circle(ax, pos[target.index], self._covering_range, Color.GREEN)
        draw.draw_comm_lines(ax, env, env.state, env_index, self._comms_range)


class HeuristicPolicy(BaseHeuristicPolicy):
    """Circle-patrol + lidar-chase heuristic (reference discovery.py:307-357):
    orbit a 0.75-radius circle, dive at targets the target-lidar sees, and
    back off from agents the agent-lidar sees."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions
        circle_radius = 0.75
        current_pos = observation[:, :2]
        v = current_pos
        norm_v = jnp.linalg.norm(v, axis=1, keepdims=True)
        closest = v / jnp.where(norm_v == 0, 1.0, norm_v) * circle_radius
        normal = jnp.stack([closest[:, 1], -closest[:, 0]], axis=1)
        n = jnp.linalg.norm(normal, axis=1, keepdims=True)
        normal = normal / jnp.where(n == 0, 1.0, n) * 0.1
        des_pos = closest + normal

        lidar_targets = observation[:, 4:19]
        target_visible = jnp.any(lidar_targets < 0.3, axis=1)
        target_dir = (
            jnp.argmin(lidar_targets, axis=1) / lidar_targets.shape[1] * 2 * jnp.pi
        )
        target_vec = jnp.stack([jnp.cos(target_dir), jnp.sin(target_dir)], axis=1)
        des_pos = jnp.where(
            target_visible[:, None], current_pos + target_vec * 0.1, des_pos
        )

        if observation.shape[-1] > 19:
            lidar_agents = observation[:, 19:31]
            agent_visible = jnp.any(lidar_agents < 0.15, axis=1)
            agent_dir = (
                jnp.argmin(lidar_agents, axis=1) / lidar_agents.shape[1] * 2 * jnp.pi
            )
            agent_vec = jnp.stack([jnp.cos(agent_dir), jnp.sin(agent_dir)], axis=1)
            des_pos = jnp.where(
                agent_visible[:, None], current_pos - agent_vec * 0.1, des_pos
            )

        return jnp.clip((des_pos - current_pos) * 10, -u_range, u_range)
