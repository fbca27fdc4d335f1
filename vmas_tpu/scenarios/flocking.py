"""Flocking scenario (scripted circling target + Lidar).

Behavioral reference: /root/reference/vmas/scenarios/flocking.py. The scripted
target's clock ``self.t`` and the per-agent shaping baselines live in scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.sensors import Lidar
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        n_obstacles = kwargs.pop("n_obstacles", 5)
        self._min_dist_between_entities = kwargs.pop("min_dist_between_entities", 0.15)
        self.n_lidar_rays = kwargs.pop("n_lidar_rays", 12)
        self.collision_reward = kwargs.pop("collision_reward", -0.1)
        self.dist_shaping_factor = kwargs.pop("dist_shaping_factor", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.plot_grid = True
        self.desired_distance = 0.1
        self.min_collision_distance = 0.005
        self.x_dim = 1
        self.y_dim = 1

        world = World(batch_dim, device, collision_force=400, substeps=5)

        def target_script(agent, world_, state):
            t = state.scenario["t"] / 30
            return agent.set_u(state, jnp.stack([jnp.cos(t), jnp.sin(t)], axis=1))

        self._target = Agent(
            name="target", collide=True, color=Color.GREEN, render_action=True,
            action_script=target_script,
        )
        world.add_agent(self._target)
        goal_entity_filter = lambda e: not isinstance(e, Agent)
        for i in range(n_agents):
            world.add_agent(
                Agent(
                    name=f"agent_{i}", collide=True, render_action=True,
                    sensors=[
                        Lidar(world, n_rays=self.n_lidar_rays, max_range=0.2, entity_filter=goal_entity_filter)
                    ],
                )
            )
        self.obstacles = []
        for i in range(n_obstacles):
            obstacle = Landmark(
                name=f"obstacle_{i}", collide=True, movable=False,
                shape=Sphere(radius=0.1), color=Color.RED,
            )
            world.add_landmark(obstacle)
            self.obstacles.append(obstacle)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        target_pos = jnp.stack([jnp.zeros((B,)), jnp.full((B,), -float(self.y_dim))], axis=-1)
        state = self._target.set_pos(state, target_pos)
        state = ScenarioUtils.spawn_entities_randomly(
            self.obstacles + self.world.policy_agents, self.world, state, key,
            self._min_dist_between_entities,
            x_bounds=(-self.x_dim, self.x_dim), y_bounds=(-self.y_dim, self.y_dim),
            occupied_positions=target_pos[:, None, :],
        )
        A = len(self.world.policy_agents)
        scratch = dict(state.scenario)
        scratch["t"] = jnp.zeros((B,), jnp.float32)
        scratch["distance_shaping"] = self._dist_shaping(state)
        scratch["collision_rew"] = jnp.zeros((B, A), jnp.float32)
        scratch["dist_rew"] = jnp.zeros((B, A), jnp.float32)
        return state.replace(scenario=scratch)

    def _dist_shaping(self, state):
        """[B, A_policy] mean squared deviation from desired inter-agent dist."""
        cols = []
        for agent in self.world.policy_agents:
            d = jnp.stack(
                [safe_norm(agent.pos(state) - a.pos(state)) for a in self.world.agents if a is not agent],
                axis=1,
            )
            cols.append(jnp.mean((d - self.desired_distance) ** 2, axis=-1) * self.dist_shaping_factor)
        return jnp.stack(cols, axis=-1)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["t"] = scratch["t"] + 1
        A = len(self.world.policy_agents)
        coll = jnp.zeros((state.batch_dim, A), jnp.float32)
        if self.collision_reward != 0:
            slot_of = {a.name: s for s, a in enumerate(self.world.policy_agents)}
            for i, a in enumerate(self.world.agents):
                for j, b in enumerate(self.world.agents):
                    if j <= i:
                        continue
                    hit = (
                        self.world.get_distance(state, a, b) <= self.min_collision_distance
                    ).astype(jnp.float32)
                    if a.action_script is None:
                        coll = coll.at[:, slot_of[a.name]].add(self.collision_reward * hit)
                    if b.action_script is None:
                        coll = coll.at[:, slot_of[b.name]].add(self.collision_reward * hit)
        scratch["collision_rew"] = coll
        new_shaping = self._dist_shaping(state)
        scratch["dist_rew"] = scratch["distance_shaping"] - new_shaping
        scratch["distance_shaping"] = new_shaping
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        return s["collision_rew"][:, agent.slot - 1] + s["dist_rew"][:, agent.slot - 1]

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                agent.pos(state) - self._target.pos(state),
                agent.sensors[0].measure(state),
            ],
            axis=-1,
        )

    def info(self, agent, state):
        s = state.scenario
        return {
            "agent_collision_rew": s["collision_rew"][:, agent.slot - 1],
            "agent_distance_rew": s["dist_rew"][:, agent.slot - 1],
        }

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit the O(A^2) pair rewards and the non-Lidar obs rows from the
        fused physics kernel (fused.FusedOutputs); the Lidar sweep stays on
        the XLA raycast path and is appended in unpack (a fused raycast
        measured slower — see docs/PERFORMANCE.md). Mirrors
        pre_rewards/reward/observation above; asserted equal by
        tests/test_fused.py."""
        from vmas_tpu.core import fused as F

        policy = world.policy_agents
        all_agents = world.agents  # target + policy
        A = len(policy)
        target_i = self._target.index
        coll_rew = float(self.collision_reward)
        min_coll = float(self.min_collision_distance)
        desired = float(self.desired_distance)
        factor = float(self.dist_shaping_factor)
        slot_of = {a.name: s for s, a in enumerate(policy)}
        agent_w = 6  # pos(2) vel(2) pos-target(2)

        class FlockingOutputs(F.FusedOutputs):
            n_scratch_in = A + 1  # previous distance_shaping columns + t
            n_out = A * agent_w + 3 * A + 1
            # rows-carried rollout: next scratch = the emitted new_shaping
            # rows and the incremented clock row; Lidar obs reconstruct
            # per-step states from recorded carries; the scripted target's
            # u is a pure function of the clock, precomputed over the
            # horizon (script_us) and ridden on the action rows
            carry_extra_idx = tuple(
                range(A * agent_w + 2 * A, A * agent_w + 3 * A)
            ) + (A * agent_w + 3 * A,)
            unpack_reads = ("state",)
            script_slots = (target_i,)

            @staticmethod
            def script_us(state, horizon):
                # target_script (above): u = [cos(t/30), sin(t/30)], where
                # t is the scenario clock at ACTION time — t0 + k at step k
                # (pre_rewards increments after physics). Integer-valued
                # f32 adds are exact, so t0+k == k unit increments bitwise.
                t0 = state.scenario["t"]
                t = (
                    t0[None, :]
                    + jnp.arange(horizon, dtype=jnp.float32)[:, None]
                ) / 30
                return (jnp.stack([jnp.cos(t), jnp.sin(t)], axis=-1),)

            @staticmethod
            def scratch_rows(state):
                return jnp.concatenate(
                    [
                        state.scenario["distance_shaping"].T,  # [A, B]
                        state.scenario["t"][None],  # [1, B]
                    ],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                prev = ctx["scratch"]

                # pairwise distances once; reused by both reward terms
                dist = {}
                for i, a in enumerate(all_agents):
                    for j, b in enumerate(all_agents):
                        if j <= i:
                            continue
                        dist[(i, j)] = F._norm(
                            px[a.index] - px[b.index], py[a.index] - py[b.index]
                        )

                coll = [None] * A
                if coll_rew != 0:
                    for i, a in enumerate(all_agents):
                        for j, b in enumerate(all_agents):
                            if j <= i:
                                continue
                            # sphere-sphere get_distance (queries.py:42-43)
                            hit = (
                                dist[(i, j)]
                                - float(a.shape.radius) - float(b.shape.radius)
                                <= min_coll
                            ).astype(jnp.float32) * coll_rew
                            for e in (a, b):
                                if e.action_script is None:
                                    s_ = slot_of[e.name]
                                    coll[s_] = hit if coll[s_] is None else coll[s_] + hit
                coll = [
                    c if c is not None else jnp.zeros_like(px[0]) for c in coll
                ]

                dist_rew, new_shaping = [], []
                for s_, a in enumerate(policy):
                    i = all_agents.index(a)
                    ds = [
                        dist[(min(i, j), max(i, j))]
                        for j, b in enumerate(all_agents)
                        if b is not a
                    ]
                    mean_sq = sum((d - desired) ** 2 for d in ds) / len(ds)
                    shaping = mean_sq * factor
                    new_shaping.append(shaping)
                    dist_rew.append(prev[s_] - shaping)

                rows = []
                for a in policy:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        px[ai] - px[target_i], py[ai] - py[target_i],
                    ]
                rows += coll + dist_rew + new_shaping
                rows.append(prev[A] + 1.0)  # the clock (pre_rewards t += 1)
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * agent_w
                coll = extra[base : base + A].T                # [B, A]
                dist_rew = extra[base + A : base + 2 * A].T
                shaping = extra[base + 2 * A : base + 3 * A].T
                obs = tuple(
                    jnp.concatenate(
                        [
                            extra[i * agent_w : (i + 1) * agent_w].T,
                            a.sensors[0].measure(state),
                        ],
                        -1,
                    )
                    for i, a in enumerate(policy)
                )
                rews = tuple(coll[:, s_] + dist_rew[:, s_] for s_ in range(A))
                terminated = jnp.zeros((state.batch_dim,), bool)
                updates = {
                    # the clock from its emitted kernel row (t_prev + 1.0 is
                    # an exact f32 integer add == the hook's t + 1) — NOT
                    # from `state`, which is the rollout-INITIAL state in
                    # the rows path's vmapped unpack
                    "t": extra[base + 3 * A],
                    "collision_rew": coll,
                    "dist_rew": dist_rew,
                    "distance_shaping": shaping,
                }
                return obs, rews, terminated, updates

        return FlockingOutputs()


class HeuristicPolicy(BaseHeuristicPolicy):
    """Reference flocking.py:209-249."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions
        circle_radius = 0.3
        current_pos = observation[:, :2]
        v = current_pos
        norm_v = jnp.linalg.norm(v, axis=1, keepdims=True)
        closest = v / jnp.where(norm_v == 0, 1.0, norm_v) * circle_radius
        normal = jnp.stack([closest[:, Y], -closest[:, X]], axis=1)
        n = jnp.linalg.norm(normal, axis=1, keepdims=True)
        normal = normal / jnp.where(n == 0, 1.0, n) * 0.1
        des_pos = closest + normal

        lidar = observation[:, 6:18]
        object_visible = jnp.any(lidar < 0.1, axis=1)
        object_dir = jnp.argmin(lidar, axis=1) / lidar.shape[1] * 2 * jnp.pi
        object_vec = jnp.stack([jnp.cos(object_dir), jnp.sin(object_dir)], axis=1)
        des_pos_object = current_pos - object_vec * 0.1
        des_pos = jnp.where(object_visible[:, None], des_pos_object, des_pos)
        return jnp.clip((des_pos - current_pos) * 10, -u_range, u_range)
