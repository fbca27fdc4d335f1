"""Navigation scenario (goals + Lidar).

Behavioral reference: /root/reference/vmas/scenarios/navigation.py.
Per-agent shaping baselines / collision rewards become [B, A] scratch arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.sensors import Lidar
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.plot_grid = False
        self.n_agents = kwargs.pop("n_agents", 4)
        self.collisions = kwargs.pop("collisions", True)
        self.world_spawning_x = kwargs.pop("world_spawning_x", 1)
        self.world_spawning_y = kwargs.pop("world_spawning_y", 1)
        self.enforce_bounds = kwargs.pop("enforce_bounds", False)
        self.agents_with_same_goal = kwargs.pop("agents_with_same_goal", 1)
        self.split_goals = kwargs.pop("split_goals", False)
        self.observe_all_goals = kwargs.pop("observe_all_goals", False)
        self.lidar_range = kwargs.pop("lidar_range", 0.35)
        self.agent_radius = kwargs.pop("agent_radius", 0.1)
        self.comms_range = kwargs.pop("comms_range", 0)
        self.n_lidar_rays = kwargs.pop("n_lidar_rays", 12)
        self.shared_rew = kwargs.pop("shared_rew", True)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", -1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.min_distance_between_entities = self.agent_radius * 2 + 0.05
        self.min_collision_distance = 0.005

        x_semidim = self.world_spawning_x if self.enforce_bounds else None
        y_semidim = self.world_spawning_y if self.enforce_bounds else None

        assert 1 <= self.agents_with_same_goal <= self.n_agents
        if self.agents_with_same_goal > 1:
            assert not self.collisions, "If agents share goals they cannot be collidables"
        if self.split_goals:
            assert (
                self.n_agents % 2 == 0 and self.agents_with_same_goal == self.n_agents // 2
            ), "Splitting the goals is allowed when the agents are even and half the team has the same goal"

        world = World(batch_dim, device, substeps=2, x_semidim=x_semidim, y_semidim=y_semidim)

        known_colors = [
            (0.22, 0.49, 0.72), (1.00, 0.50, 0), (0.30, 0.69, 0.29),
            (0.97, 0.51, 0.75), (0.60, 0.31, 0.64), (0.89, 0.10, 0.11), (0.87, 0.87, 0),
        ]
        entity_filter_agents = lambda e: isinstance(e, Agent)

        self.goals = []
        for i in range(self.n_agents):
            color = known_colors[i % len(known_colors)]
            agent = Agent(
                name=f"agent_{i}", collide=self.collisions, color=color,
                shape=Sphere(radius=self.agent_radius), render_action=True,
                sensors=(
                    [
                        Lidar(
                            world, n_rays=self.n_lidar_rays, max_range=self.lidar_range,
                            entity_filter=entity_filter_agents,
                        )
                    ]
                    if self.collisions
                    else None
                ),
            )
            world.add_agent(agent)
            goal = Landmark(name=f"goal {i}", collide=False, color=color)
            world.add_landmark(goal)
            agent.goal = goal
            self.goals.append(goal)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        state = ScenarioUtils.spawn_entities_randomly(
            self.world.agents, self.world, state, k1,
            self.min_distance_between_entities,
            (-self.world_spawning_x, self.world_spawning_x),
            (-self.world_spawning_y, self.world_spawning_y),
        )
        a_idx = jnp.asarray([a.index for a in self.world.agents])
        occupied = state.pos[:, a_idx]
        goal_poses = []
        for i in range(self.n_agents):
            pos = ScenarioUtils.find_random_pos_for_entity(
                occupied, jax.random.fold_in(k2, i), self.world,
                self.min_distance_between_entities,
                (-self.world_spawning_x, self.world_spawning_x),
                (-self.world_spawning_y, self.world_spawning_y),
            )
            goal_poses.append(pos[:, 0])
            occupied = jnp.concatenate([occupied, pos], axis=1)

        for i, agent in enumerate(self.world.agents):
            if self.split_goals:
                goal_index = int(i // self.agents_with_same_goal)
            else:
                goal_index = 0 if i < self.agents_with_same_goal else i
            state = agent.goal.set_pos(state, goal_poses[goal_index])

        pos_shaping = jnp.stack(
            [
                safe_norm(a.pos(state) - a.goal.pos(state)) * self.pos_shaping_factor
                for a in self.world.agents
            ],
            axis=-1,
        )
        scratch = dict(state.scenario)
        scratch["pos_shaping"] = pos_shaping  # [B, A]
        scratch["pos_rew_per_agent"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["collision_rew"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["final_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = jnp.stack(
            [safe_norm(a.pos(state) - a.goal.pos(state)) for a in self.world.agents], axis=-1
        )  # [B, A]
        on_goal = dist < jnp.asarray([a.goal.shape.radius for a in self.world.agents])[None]
        pos_shaping = dist * self.pos_shaping_factor
        per_agent = scratch["pos_shaping"] - pos_shaping
        scratch["pos_shaping"] = pos_shaping
        scratch["pos_rew_per_agent"] = per_agent
        scratch["pos_rew"] = per_agent.sum(-1)
        all_reached = jnp.all(on_goal, axis=-1)
        scratch["final_rew"] = jnp.where(all_reached, self.final_reward, 0.0)

        coll = jnp.zeros_like(per_agent)
        for i, a in enumerate(self.world.agents):
            for j, b in enumerate(self.world.agents):
                if i <= j or not self.world.collides(a, b):
                    continue
                d = self.world.get_distance(state, a, b)
                hit = (d <= self.min_collision_distance).astype(jnp.float32)
                coll = coll.at[:, i].add(self.agent_collision_penalty * hit)
                coll = coll.at[:, j].add(self.agent_collision_penalty * hit)
        scratch["collision_rew"] = coll
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        pos_reward = s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot]
        return pos_reward + s["final_rew"] + s["collision_rew"][:, agent.slot]

    def observation(self, agent, state):
        if self.observe_all_goals:
            goal_poses = [agent.pos(state) - a.goal.pos(state) for a in self.world.agents]
        else:
            goal_poses = [agent.pos(state) - agent.goal.pos(state)]
        lidar = (
            [agent.sensors[0].max_range - agent.sensors[0].measure(state)]
            if self.collisions
            else []
        )
        return jnp.concatenate([agent.pos(state), agent.vel(state)] + goal_poses + lidar, axis=-1)

    def done(self, state):
        return jnp.stack(
            [
                safe_norm(a.pos(state) - a.goal.pos(state)) < a.shape.radius
                for a in self.world.agents
            ],
            axis=-1,
        ).all(-1)

    def info(self, agent, state):
        s = state.scenario
        return {
            "pos_rew": s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot],
            "final_rew": s["final_rew"],
            "agent_collisions": s["collision_rew"][:, agent.slot],
        }


    def extra_render(self, env, ax, env_index: int = 0):
        """Agent communication lines (reference navigation.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_comm_lines(ax, env, env.state, env_index, self.comms_range)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs); the Lidar sweep stays on the XLA raycast path
        and is appended in unpack. Mirrors pre_rewards/reward/observation/
        done above; asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        goal_r = [float(a.goal.shape.radius) for a in agents]
        done_r = [float(a.shape.radius) for a in agents]
        factor = float(self.pos_shaping_factor)
        final = float(self.final_reward)
        coll_pen = float(self.agent_collision_penalty)
        min_coll = float(self.min_collision_distance)
        shared = bool(self.shared_rew)
        all_goals = bool(self.observe_all_goals)
        lidar_on = bool(self.collisions)
        pairs = [
            (i, j)
            for i in range(A)
            for j in range(A)
            if i > j and world.collides(agents[i], agents[j])
        ]
        obs_w = 4 + 2 * (A if all_goals else 1)

        class NavigationOutputs(F_.FusedOutputs):
            n_scratch_in = A  # previous pos_shaping columns
            n_out = A * obs_w + 3 * A + 2
            # rows-carried rollout: next scratch = this step's emitted
            # shaping rows. With Lidar on, the obs read per-step entity
            # positions — declared via unpack_reads so the rows path
            # records its carry rows and batches the raycast over T*B.
            carry_extra_idx = tuple(range(A * obs_w + 2 * A, A * obs_w + 3 * A))
            unpack_reads = ("state",) if lidar_on else ()

            @staticmethod
            def scratch_rows(state):
                return state.scenario["pos_shaping"].T  # [A, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                prev = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                goal_rel, dist = [], []
                for i, a in enumerate(agents):
                    gx = px[a.index] - px[a.goal.index]
                    gy = py[a.index] - py[a.goal.index]
                    goal_rel.append((gx, gy))
                    dist.append(safe_norm2(gx, gy))
                on_goal = [dist[i] < goal_r[i] for i in range(A)]
                shaping = [dist[i] * factor for i in range(A)]
                per_agent = [prev[i] - shaping[i] for i in range(A)]
                all_reached = None
                for og in on_goal:
                    all_reached = og if all_reached is None else (all_reached & og)
                final_rew = jnp.where(all_reached, final, 0.0)

                coll = [jnp.zeros_like(px[0]) for _ in range(A)]
                for i, j in pairs:
                    d = (
                        safe_norm2(
                            px[agents[i].index] - px[agents[j].index],
                            py[agents[i].index] - py[agents[j].index],
                        )
                        - done_r[i] - done_r[j]
                    )
                    hit = (d <= min_coll).astype(jnp.float32) * coll_pen
                    coll[i] = coll[i] + hit
                    coll[j] = coll[j] + hit

                done = None
                for i in range(A):
                    d_ok = dist[i] < done_r[i]
                    done = d_ok if done is None else (done & d_ok)

                rows = []
                for i, a in enumerate(agents):
                    rows += [px[a.index], py[a.index], vx[a.index], vy[a.index]]
                    if all_goals:
                        for b in agents:
                            rows += [
                                px[a.index] - px[b.goal.index],
                                py[a.index] - py[b.goal.index],
                            ]
                    else:
                        rows += list(goal_rel[i])
                rows += per_agent + coll + shaping
                rows += [final_rew, done.astype(jnp.float32)]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                per_agent = extra[base : base + A].T            # [B, A]
                coll = extra[base + A : base + 2 * A].T
                shaping = extra[base + 2 * A : base + 3 * A].T
                final_rew = extra[base + 3 * A]
                done = extra[base + 3 * A + 1] > 0.5
                pos_rew = per_agent.sum(-1)
                obs = tuple(
                    jnp.concatenate(
                        [extra[i * obs_w : (i + 1) * obs_w].T]
                        + (
                            [
                                a.sensors[0].max_range
                                - a.sensors[0].measure(state)
                            ]
                            if lidar_on
                            else []
                        ),
                        -1,
                    )
                    for i, a in enumerate(agents)
                )
                rews = tuple(
                    (pos_rew if shared else per_agent[:, i])
                    + final_rew + coll[:, i]
                    for i in range(A)
                )
                updates = {
                    "pos_shaping": shaping,
                    "pos_rew_per_agent": per_agent,
                    "pos_rew": pos_rew,
                    "final_rew": final_rew,
                    "collision_rew": coll,
                }
                return obs, rews, done, updates

        return NavigationOutputs()


class HeuristicPolicy(BaseHeuristicPolicy):
    """CLF-QP goal-seeking controller — a jax port of the reference's
    cvxpylayers QP (navigation.py:314-410):

        minimize  ||u||^2 + clf_slack * s^2
        s.t.      -u_range <= u <= u_range
                  LfV + LgV·u + clf_epsilon*V + s <= 0

    with the Lyapunov function V = |p-g|^2 + 0.5 (p-g)·v + |v|^2 from the
    reference (arXiv:1903.03692). The reference solves it with a generic
    differentiable QP layer; with ONE inequality plus a box the exact KKT
    solution is one-dimensional in the dual multiplier λ:
    u(λ) = clip(-λ·LgV/2, -r, r), s(λ) = -λ/(2w), and the constraint
    residual a + LgV·u(λ) + s(λ) (a = LfV + εV) is strictly decreasing in
    λ, so fixed-iteration bisection finds the root exactly — vectorized
    over envs, no host dependency, jit-compatible."""

    def __init__(self, *args, clf_epsilon=0.2, clf_slack=100.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.clf_epsilon = clf_epsilon
        self.clf_slack = clf_slack

    def compute_action(self, observation, u_range):
        # obs layout: pos(2), vel(2), pos - goal(2), ... — the reference
        # recovers goal_pos and then only ever uses pos - goal_pos (= rel)
        vel = observation[:, 2:4]
        rel = observation[:, 4:6]
        V = (rel[:, 0] ** 2 + 0.5 * rel[:, 0] * vel[:, 0] + vel[:, 0] ** 2
             + rel[:, 1] ** 2 + 0.5 * rel[:, 1] * vel[:, 1] + vel[:, 1] ** 2)
        LfV = ((2 * rel[:, 0] + vel[:, 0]) * vel[:, 0]
               + (2 * rel[:, 1] + vel[:, 1]) * vel[:, 1])
        LgV = jnp.stack(
            [0.5 * rel[:, 0] + 2 * vel[:, 0], 0.5 * rel[:, 1] + 2 * vel[:, 1]],
            axis=1,
        )
        a = LfV + self.clf_epsilon * V
        w = self.clf_slack
        r = u_range

        def u_of(lam):
            return jnp.clip(-lam[:, None] * LgV / 2.0, -r, r)

        def resid(lam):
            # LgV·u(λ) <= 0 for λ>=0, so resid(hi) <= a - hi/(2w) < 0 at
            # hi = 2w(|a|+1): a sign change is bracketed whenever a > 0
            return a + jnp.sum(LgV * u_of(lam), axis=1) - lam / (2.0 * w)

        lo = jnp.zeros_like(a)
        hi = 2.0 * w * (jnp.abs(a) + 1.0)

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            pos = resid(mid) > 0
            return jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 60, body, (lo, hi))
        lam = 0.5 * (lo + hi)
        # constraint already satisfied at u=0 (a <= 0) -> λ=0 -> u=0,
        # exactly the QP's minimum-norm optimum
        lam = jnp.where(a <= 0, 0.0, lam)
        return u_of(lam)
