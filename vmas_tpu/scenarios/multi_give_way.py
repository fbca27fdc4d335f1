"""Multi give-way scenario (4-way intersection swap with PID control).

Behavioral reference: /root/reference/vmas/scenarios/multi_give_way.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Box, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import JaxUtils, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.u_range = kwargs.pop("u_range", 0.5)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0)
        self.box_agents = kwargs.pop("box_agents", False)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.comms_range = kwargs.pop("comms_range", 5)
        self.shared_rew = kwargs.pop("shared_rew", True)
        kwargs.pop("n_agents", 4)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", -0.1)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_zoom = 1.7
        controller_params = [2, 6, 0.002]
        self.n_agents = 4
        self.f_range = self.a_range + self.linear_friction

        world = World(
            batch_dim, device, drag=0, dt=0.1, linear_friction=self.linear_friction,
            substeps=16 if self.box_agents else 5,
            collision_force=10000 if self.box_agents else 500,
        )

        self.agent_radius = 0.16
        self.agent_box_length = 0.32
        self.agent_box_width = 0.24
        self.min_collision_distance = 0.005
        colors = [Color.GREEN, Color.BLUE, Color.RED, Color.GRAY]

        self.controllers = {}
        for i in range(self.n_agents):
            agent = Agent(
                name=f"agent_{i}", rotatable=False, linear_friction=self.linear_friction,
                shape=(
                    Sphere(radius=self.agent_radius)
                    if not self.box_agents
                    else Box(length=self.agent_box_length, width=self.agent_box_width)
                ),
                u_range=self.u_range, f_range=self.f_range, render_action=True,
                color=colors[i],
            )
            self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")
            goal = Landmark(
                name=f"goal {i}", collide=False,
                shape=Sphere(radius=self.agent_radius / 2), color=colors[i],
            )
            agent.goal = goal
            world.add_agent(agent)
            world.add_landmark(goal)

        self.spawn_map(world)
        return world

    def spawn_map(self, world):
        self.scenario_length = 5
        self.scenario_width = 0.4
        self.long_wall_length = (self.scenario_length / 2) - (self.scenario_width / 2)
        self.short_wall_length = self.scenario_width
        self.goal_dist_from_wall = self.agent_radius + 0.05
        self.agent_dist_from_wall = 0.5
        self.long_walls = []
        for i in range(8):
            lm = Landmark(name=f"wall {i}", collide=True, shape=Line(length=self.long_wall_length), color=Color.BLACK)
            self.long_walls.append(lm)
            world.add_landmark(lm)
        self.short_walls = []
        for i in range(4):
            lm = Landmark(name=f"short wall {i}", collide=True, shape=Line(length=self.short_wall_length), color=Color.BLACK)
            self.short_walls.append(lm)
            world.add_landmark(lm)

    def reset_map(self, state):
        half = self.scenario_length / 2
        for i, lm in enumerate(self.short_walls):
            if i < 2:
                state = lm.set_pos(state, jnp.asarray([-half if i % 2 == 0 else half, 0.0], jnp.float32))
                state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
            else:
                state = lm.set_pos(state, jnp.asarray([0.0, -half if i % 2 == 0 else half], jnp.float32))
        long_wall_pos = self.long_wall_length / 2 - half
        for i, lm in enumerate(self.long_walls):
            if i < 4:
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [long_wall_pos * (1 if i < 2 else -1),
                         self.scenario_width / 2 * (-1 if i % 2 == 0 else 1)],
                        jnp.float32,
                    ),
                )
            else:
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [self.scenario_width / 2 * (-1 if i % 2 == 0 else 1),
                         long_wall_pos * (1 if i < 6 else -1)],
                        jnp.float32,
                    ),
                )
                state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
        return state

    def reset_world_at(self, state, key):
        B = state.batch_dim
        start = self.scenario_length / 2 - self.agent_dist_from_wall
        goal_d = self.scenario_length / 2 - self.goal_dist_from_wall
        for i, agent in enumerate(self.world.agents):
            state = self.controllers[agent.name].reset(state)
            next_i = (i + 1) % self.n_agents
            if i in [0, 2]:
                state = agent.set_pos(state, jnp.asarray([start * (-1 if i == 0 else 1), 0.0], jnp.float32))
                state = self.world.agents[next_i].goal.set_pos(
                    state, jnp.asarray([goal_d * (-1 if i == 0 else 1), 0.0], jnp.float32)
                )
            else:
                state = agent.set_pos(state, jnp.asarray([0.0, start * (1 if i == 1 else -1)], jnp.float32))
                state = self.world.agents[next_i].goal.set_pos(
                    state, jnp.asarray([0.0, goal_d * (1 if i == 1 else -1)], jnp.float32)
                )
        state = self.reset_map(state)

        scratch = dict(state.scenario)
        scratch["shaping"] = jnp.stack(
            [
                safe_norm(a.pos(state) - a.goal.pos(state)) * self.pos_shaping_factor
                for a in self.world.agents
            ],
            axis=-1,
        )
        scratch["reached_goal"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew_per_agent"] = jnp.zeros((B, self.n_agents), jnp.float32)
        scratch["final_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        u = JaxUtils.clamp_with_norm(agent.u(state), self.u_range)
        u = jnp.where((safe_norm(u) < self.min_input_norm)[:, None], 0.0, u)
        state = agent.set_u(state, u)
        vc = self.controllers[agent.name]
        state = vc.reset(state, env_mask=safe_norm(u) < 1e-3)
        return vc.process_force(state)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = jnp.stack(
            [safe_norm(a.pos(state) - a.goal.pos(state)) for a in self.world.agents], axis=-1
        )
        on_goal = dist < jnp.asarray([a.goal.shape.radius for a in self.world.agents])[None]
        pos_shaping = dist * self.pos_shaping_factor
        if self.pos_shaping_factor != 0:
            per_agent = scratch["shaping"] - pos_shaping
        else:
            per_agent = -dist * 0.0001
        scratch["shaping"] = pos_shaping
        scratch["pos_rew_per_agent"] = per_agent
        scratch["pos_rew"] = per_agent.sum(-1)
        all_reached = jnp.all(on_goal, axis=-1)
        scratch["final_rew"] = jnp.where(all_reached, self.final_reward, 0.0)
        scratch["reached_goal"] = scratch["reached_goal"] | all_reached
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        B = state.batch_dim
        coll = jnp.zeros((B,), jnp.float32)
        for a in self.world.agents:
            if a is not agent:
                hit = self.world.get_distance(state, agent, a) <= self.min_collision_distance
                coll = coll + self.agent_collision_penalty * hit.astype(jnp.float32)
        pos = s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot]
        return pos + coll + s["final_rew"]

    def observation(self, agent, state):
        observations = [
            agent.pos(state),
            agent.vel(state),
            agent.pos(state) - agent.goal.pos(state),
            safe_norm(agent.pos(state) - agent.goal.pos(state))[:, None],
        ]
        if self.obs_noise > 0:
            import jax

            observations = [
                o + jax.random.uniform(
                    self.obs_key(state, agent.slot * 10 + i), o.shape,
                    minval=-self.obs_noise, maxval=self.obs_noise,
                )
                for i, o in enumerate(observations)
            ]
        return jnp.concatenate(observations, axis=-1)

    def info(self, agent, state):
        s = state.scenario
        return {
            "pos_rew": s["pos_rew"] if self.shared_rew else s["pos_rew_per_agent"][:, agent.slot],
            "final_rew": s["final_rew"],
        }

    def extra_render(self, env, ax, env_index: int = 0):
        """Agent communication lines (reference multi_give_way.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_comm_lines(ax, env, env.state, env_index, self.comms_range)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs) for sphere agents (box_agents falls back — the
        box-box distance candidates aren't worth unrolling here). The
        per-agent pairwise collision penalties run in-kernel; observation
        noise is applied in unpack with the hook's keys."""
        if self.box_agents:
            return None
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        radius = float(self.agent_radius)
        goal_r = [float(a.goal.shape.radius) for a in agents]
        factor = float(self.pos_shaping_factor)
        final = float(self.final_reward)
        coll_pen = float(self.agent_collision_penalty)
        min_coll = float(self.min_collision_distance)
        shared = bool(self.shared_rew)
        noise = float(self.obs_noise)
        scenario = self
        obs_w = 7  # pos2 vel2 goal_rel2 dist1

        u_rng = float(self.u_range)
        min_in = float(self.min_input_norm)
        pids = [self.controllers[a.name].rows_step() for a in agents]

        class MultiGiveWayOutputs(F_.FusedOutputs):
            n_scratch_in = A + 1  # shaping columns + reached_goal
            n_out = A * obs_w + 3 * A + 2
            # rows-carried rollout: next scratch = emitted shaping rows
            # + the reached_goal latch; the (always-on) PID velocity
            # controller is realized in-kernel exactly like give_way's
            # (same reference semantics) — 4 carry rows per agent, raw
            # controller u emitted for the final state. Noisy-obs configs
            # declare the per-step obs-key read.
            carry_extra_idx = tuple(
                range(A * obs_w + 2 * A, A * obs_w + 3 * A)
            ) + (A * obs_w + 3 * A + 1,)
            unpack_reads = ("obs_key",) if noise > 0 else ()
            n_ctrl = 4 * A
            n_ctrl_out = 2 * A
            ctrl_u_idx = tuple(
                (
                    A * obs_w + 3 * A + 2 + 2 * i,
                    A * obs_w + 3 * A + 2 + 2 * i + 1,
                )
                for i in range(A)
            )
            if True:  # (indent kept: the controller helpers below)

                @staticmethod
                def ctrl_rows(state):
                    rows = []
                    for a in agents:
                        cs = state.scenario[f"__vel_ctrl_{a.name}"]
                        rows += [
                            cs["accum_errs"][:, 0], cs["accum_errs"][:, 1],
                            cs["prev_err"][:, 0], cs["prev_err"][:, 1],
                        ]
                    return jnp.stack(rows, axis=0)

                @staticmethod
                def ctrl_updates(rows, scenario_scratch):
                    out = {}
                    for i, a in enumerate(agents):
                        r = rows[4 * i : 4 * (i + 1)]
                        out[f"__vel_ctrl_{a.name}"] = {
                            "accum_errs": jnp.stack([r[0], r[1]], axis=-1),
                            "prev_err": jnp.stack([r[2], r[3]], axis=-1),
                        }
                    return out

                @staticmethod
                def process_act_rows(ctx):
                    # mirrors process_action above op for op (clamp_with_norm
                    # -> min_input_norm zeroing -> masked PID reset -> PID)
                    fx, fy = ctx["fx"], ctx["fy"]
                    vx, vy = ctx["vx"], ctx["vy"]
                    ctrl = ctx["ctrl"]
                    out_rows = []
                    for i, a in enumerate(agents):
                        e = a.index
                        ux, uy = fx[e], fy[e]
                        n = jnp.sqrt(ux * ux + uy * uy)
                        over = n > u_rng
                        den = jnp.where(over, n, 1.0)
                        ux = jnp.where(over, ux / den * u_rng, ux)
                        uy = jnp.where(over, uy / den * u_rng, uy)
                        small = F_._norm(ux, uy) < min_in
                        ux = jnp.where(small, 0.0, ux)
                        uy = jnp.where(small, 0.0, uy)
                        reset_m = F_._norm(ux, uy) < 1e-3
                        acx, acy, prx, pry = ctrl[4 * i : 4 * (i + 1)]
                        ox, oy, acx, acy, prx, pry = pids[i](
                            ux, uy, vx[e], vy[e], acx, acy, prx, pry, reset_m
                        )
                        fx[e], fy[e] = ox, oy
                        (
                            ctrl[4 * i], ctrl[4 * i + 1],
                            ctrl[4 * i + 2], ctrl[4 * i + 3],
                        ) = (acx, acy, prx, pry)
                        out_rows += [ox, oy]
                    return out_rows

            @staticmethod
            def scratch_rows(state):
                return jnp.concatenate(
                    [
                        state.scenario["shaping"].T,
                        state.scenario["reached_goal"].astype(jnp.float32)[None],
                    ],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                prev = ctx["scratch"][:A]
                reached_prev = ctx["scratch"][A] > 0.5

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                goal_rel, dist = [], []
                for a in agents:
                    gx = px[a.index] - px[a.goal.index]
                    gy = py[a.index] - py[a.goal.index]
                    goal_rel.append((gx, gy))
                    dist.append(safe_norm2(gx, gy))
                if factor != 0:
                    shaping = [d * factor for d in dist]
                    per_agent = [prev[i] - shaping[i] for i in range(A)]
                else:
                    shaping = [d * factor for d in dist]
                    per_agent = [-d * 0.0001 for d in dist]
                all_reached = None
                for i in range(A):
                    og = dist[i] < goal_r[i]
                    all_reached = og if all_reached is None else (all_reached & og)
                final_rew = jnp.where(all_reached, final, 0.0)
                reached_new = reached_prev | all_reached

                coll = []
                for i in range(A):
                    c = None
                    for j in range(A):
                        if j == i:
                            continue
                        # sphere-sphere get_distance (queries.py:42-43)
                        d = (
                            safe_norm2(
                                px[agents[i].index] - px[agents[j].index],
                                py[agents[i].index] - py[agents[j].index],
                            )
                            - 2 * radius
                        )
                        hit = (d <= min_coll).astype(jnp.float32) * coll_pen
                        c = hit if c is None else c + hit
                    coll.append(c)

                rows = []
                for i, a in enumerate(agents):
                    rows += [px[a.index], py[a.index], vx[a.index], vy[a.index]]
                    rows += list(goal_rel[i])
                    rows.append(dist[i])
                rows += per_agent + coll + shaping
                rows += [final_rew, reached_new.astype(jnp.float32)]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                per_agent = extra[base : base + A].T
                coll = extra[base + A : base + 2 * A].T
                shaping = extra[base + 2 * A : base + 3 * A].T
                final_rew = extra[base + 3 * A]
                reached = extra[base + 3 * A + 1] > 0.5
                pos_rew = per_agent.sum(-1)
                obs = []
                for i, a in enumerate(agents):
                    o = extra[i * obs_w : (i + 1) * obs_w]
                    parts = [o[0:2].T, o[2:4].T, o[4:6].T, o[6:7].T]
                    if noise > 0:
                        parts = [
                            p
                            + jax.random.uniform(
                                scenario.obs_key(state, a.slot * 10 + k),
                                p.shape, minval=-noise, maxval=noise,
                            )
                            for k, p in enumerate(parts)
                        ]
                    obs.append(jnp.concatenate(parts, -1))
                rews = tuple(
                    (pos_rew if shared else per_agent[:, i])
                    + coll[:, i] + final_rew
                    for i in range(A)
                )
                done = jnp.zeros((state.batch_dim,), bool)
                updates = {
                    "shaping": shaping,
                    "pos_rew_per_agent": per_agent,
                    "pos_rew": pos_rew,
                    "final_rew": final_rew,
                    "reached_goal": reached,
                }
                return tuple(obs), rews, done, updates

        return MultiGiveWayOutputs()
