"""Joint passage (size variant): asymmetric-size pair through a big+small opening.

Behavioral reference: /root/reference/vmas/scenarios/joint_passage_size.py
(diffed against joint_passage.py: different defaults, a 2-slot big passage +
1-2 slot small side passage, pass-center shaping, 0/180 middle angle from the
small-passage side, non-gated rotation shaping).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Box, Color, Joint, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.joint_passage import (
    angle_to_vector,
    get_line_angle_dist_0_180,
)
from vmas_tpu.utils import ScenarioUtils


def get_line_angle_dist_0_360(angle, goal):
    return -jnp.sum(angle_to_vector(angle) * angle_to_vector(goal), axis=-1)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.fixed_passage = kwargs.pop("fixed_passage", False)
        self.joint_length = kwargs.pop("joint_length", 0.52)
        self.random_start_angle = kwargs.pop("random_start_angle", False)
        self.random_goal_angle = kwargs.pop("random_goal_angle", False)
        self.observe_joint_angle = kwargs.pop("observe_joint_angle", False)
        self.joint_angle_obs_noise = kwargs.pop("joint_angle_obs_noise", 0.0)
        self.asym_package = kwargs.pop("asym_package", False)
        self.mass_ratio = kwargs.pop("mass_ratio", 1)
        self.mass_position = kwargs.pop("mass_position", 0.75)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 1)
        self.collision_reward = kwargs.pop("collision_reward", 0)
        self.energy_reward_coeff = kwargs.pop("energy_reward_coeff", 0)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.n_passages = kwargs.pop("n_passages", 3)
        self.middle_angle_180 = kwargs.pop("middle_angle_180", False)
        self.use_vel_controller = kwargs.pop("use_vel_controller", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert self.n_passages in (3, 4)

        self.plot_grid = False
        self.visualize_semidims = False

        world = World(
            batch_dim, device, x_semidim=1, y_semidim=1,
            substeps=5 if not self.asym_package else 10,
            joint_force=700 if self.asym_package else 400,
            collision_force=2500 if self.asym_package else 1500,
            drag=0.25 if not self.asym_package else 0.15,
        )
        if not self.observe_joint_angle:
            assert self.joint_angle_obs_noise == 0

        self.n_agents = 2
        self.agent_radius = 0.03333
        self.agent_radius_2 = 3 * self.agent_radius
        self.mass_radius = self.agent_radius * (2 / 3)
        self.passage_width = 0.2
        self.passage_length = 0.1476
        self.scenario_length = 2 + 2 * self.agent_radius
        self.n_boxes = int(self.scenario_length // self.passage_length)
        self.min_collision_distance = 0.005

        controller_params = [2.0, 10, 0.00001]
        self.controllers = {}
        agent = Agent(
            name="agent_0", shape=Sphere(self.agent_radius), u_range=1,
            obs_noise=self.obs_noise, render_action=True, f_range=10,
        )
        self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")
        world.add_agent(agent)
        agent = Agent(
            name="agent_1", shape=Sphere(self.agent_radius_2), u_range=1,
            mass=1 if self.asym_package else self.mass_ratio,
            max_speed=self.max_speed_1, obs_noise=self.obs_noise,
            render_action=True, f_range=10,
        )
        self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")
        world.add_agent(agent)

        self.joint = Joint(
            world.agents[0], world.agents[1],
            anchor_a=(0, 0), anchor_b=(0, 0), dist=self.joint_length,
            rotate_a=True, rotate_b=True, collidable=False, width=0, mass=1,
        )
        world.add_joint(self.joint)

        if self.asym_package:
            self.mass = Landmark(
                name="mass", shape=Sphere(radius=self.mass_radius), collide=True,
                movable=True, color=Color.BLACK, mass=self.mass_ratio,
                collision_filter=lambda e: not isinstance(e.shape, Sphere),
            )
            world.add_landmark(self.mass)
            world.add_joint(
                Joint(self.mass, self.joint.landmark, anchor_a=(0, 0),
                      anchor_b=(self.mass_position, 0), dist=0, rotate_a=True, rotate_b=True)
            )

        self.goal = Landmark(
            name="joint_goal", shape=Line(length=self.joint_length), collide=False, color=Color.GREEN
        )
        world.add_landmark(self.goal)
        self.walls = []
        for i in range(4):
            wall = Landmark(
                name=f"wall {i}", collide=True, shape=Line(length=2 + self.agent_radius * 2),
                color=Color.BLACK,
            )
            world.add_landmark(wall)
            self.walls.append(wall)

        # passages: first n_passages are the open (non-collide) slots
        self.passages = []
        self.collide_passages = []
        self.non_collide_passages = []
        for i in range(self.n_boxes):
            passage = Landmark(
                name=f"passage {i}", collide=not (i < self.n_passages), movable=False,
                shape=Box(length=self.passage_length, width=self.passage_width),
                color=Color.RED,
                collision_filter=lambda e: not isinstance(e.shape, Box),
            )
            (self.collide_passages if passage.collide else self.non_collide_passages).append(passage)
            self.passages.append(passage)
            world.add_landmark(passage)
        return world

    # ------------------------------------------------------------------
    def _slot_pos(self, i):
        x = -1 - self.agent_radius + self.passage_length / 2 + self.passage_length * i
        return jnp.stack([x, jnp.zeros_like(x)], axis=-1)

    def spawn_passage_map(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        if self.fixed_passage:
            big_start = jnp.full((B,), 5, jnp.int32)
            small_lr = jnp.full((B,), 1, jnp.int32)
        else:
            big_start = jax.random.randint(k1, (B,), 0, self.n_boxes - 1)
            small_lr = jax.random.randint(k2, (B,), 0, 2)
        small_lr = jnp.where(big_start > self.n_boxes - 1 - (self.n_passages + 1), 0, small_lr)
        small_lr = jnp.where(big_start < self.n_passages, 1, small_lr)
        small_lr = jnp.where(small_lr == 0, -3, small_lr)
        small_lr = jnp.where(small_lr == 1, 4, small_lr)  # 1 + 3

        open_list = [big_start, big_start + 1, big_start + small_lr]
        if self.n_passages == 4:
            open_list.append(big_start + small_lr + jnp.sign(small_lr))
        open_idx = jnp.stack(open_list, axis=-1)  # [B, n_passages]

        for k, passage in enumerate(self.non_collide_passages):
            state = passage.set_rendering(state, False)
            state = passage.set_pos(state, self._slot_pos(open_idx[:, k].astype(jnp.float32)))

        n_total = self.n_boxes + self.n_passages + 2
        arr = jnp.arange(n_total)
        blocked = jnp.any(arr[None, :, None] == open_idx[:, None, :], axis=-1)
        order = jnp.argsort(jnp.where(blocked, n_total + arr, arr), axis=-1)
        for k, passage in enumerate(self.collide_passages):
            state = passage.set_pos(state, self._slot_pos(order[:, k].astype(jnp.float32)))

        big_pos = (self._slot_pos(big_start.astype(jnp.float32)) + self._slot_pos((big_start + 1).astype(jnp.float32))) / 2
        small_pos = self._slot_pos((big_start + small_lr).astype(jnp.float32))
        scratch = dict(state.scenario)
        scratch["big_passage_pos"] = big_pos
        scratch["small_passage_pos"] = small_pos
        scratch["pass_center"] = (big_pos + small_pos) / 2
        scratch["small_left_or_right"] = small_lr
        scratch["middle_angle"] = jnp.where(small_lr > 0, jnp.pi, 0.0)
        return state.replace(scenario=scratch)

    def spawn_walls(self, state):
        for i, wall in enumerate(self.walls):
            x = 0.0 if i % 2 else (1 + self.agent_radius if i == 0 else -1 - self.agent_radius)
            y = 0.0 if not i % 2 else (1 + self.agent_radius if i == 1 else -1 - self.agent_radius)
            state = wall.set_pos(state, jnp.asarray([x, y], jnp.float32))
            state = wall.set_rot(state, jnp.asarray(math.pi / 2 if not i % 2 else 0.0, jnp.float32))
        return state

    def _middle_angle_dist(self, state):
        rot = self.joint.landmark.rot(state)
        mid = state.scenario["middle_angle"]
        if self.middle_angle_180:
            return get_line_angle_dist_0_180(rot, mid)
        return get_line_angle_dist_0_360(rot, mid)

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        B = state.batch_dim
        ks = jax.random.split(key, 6)
        start_angle = jnp.where(
            jax.random.uniform(ks[0], (B,)) >= 0.5, jnp.pi / 2, -jnp.pi / 2
        )
        if self.random_goal_angle:
            goal_angle = jax.random.uniform(ks[1], (B,), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
        else:
            goal_angle = jnp.full((B,), jnp.pi)

        bigger_radius = max(self.agent_radius, self.agent_radius_2)
        sdx = (self.joint_length / 2) * jnp.cos(start_angle)
        sdy = (self.joint_length / 2) * jnp.sin(start_angle)
        gdx = (self.joint_length / 2) * jnp.cos(goal_angle)
        gdy = (self.joint_length / 2) * jnp.sin(goal_angle)

        min_x_s = -1 + (bigger_radius + jnp.abs(sdx))
        max_x_s = 1 - (bigger_radius + jnp.abs(sdx))
        min_y_s = -1 + (bigger_radius + jnp.abs(sdy))
        max_y_s = -2 * bigger_radius - self.passage_width / 2 - jnp.abs(sdy)
        min_x_g = -1 + (bigger_radius + jnp.abs(gdx))
        max_x_g = 1 - (bigger_radius + jnp.abs(gdx))
        min_y_g = 2 * bigger_radius + self.passage_width / 2 + jnp.abs(gdy)
        max_y_g = 1 - (bigger_radius + jnp.abs(gdy))

        r = jax.random.uniform(ks[2], (B, 2))
        joint_pos = jnp.stack(
            [(min_x_s - max_x_s) * r[:, 0] + max_x_s, (min_y_s - max_y_s) * r[:, 1] + max_y_s],
            axis=-1,
        )
        rg = jax.random.uniform(ks[3], (B, 2))
        goal_pos = jnp.stack(
            [(min_x_g - max_x_g) * rg[:, 0] + max_x_g, (min_y_g - max_y_g) * rg[:, 1] + max_y_g],
            axis=-1,
        )
        state = self.goal.set_pos(state, goal_pos)
        state = self.goal.set_rot(state, goal_angle)

        delta = jnp.stack([sdx, sdy], axis=-1)
        for agent in self.world.agents:
            state = self.controllers[agent.name].reset(state)
        state = self.world.agents[0].set_pos(state, joint_pos - delta)
        state = self.world.agents[1].set_pos(state, joint_pos + delta)
        if self.asym_package:
            state = self.mass.set_pos(state, joint_pos + self.mass_position * delta)

        state = self.spawn_passage_map(state, ks[4])
        state = self.spawn_walls(state)
        state = self.world.sync_joints(state)

        jl = self.joint.landmark
        scratch = dict(state.scenario)
        scratch["t"] = jnp.zeros((B,), jnp.float32)
        scratch["passed"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_shaping_pre"] = (
            safe_norm(jl.pos(state) - scratch["pass_center"]) * self.pos_shaping_factor
        )
        scratch["pos_shaping_post"] = safe_norm(jl.pos(state) - goal_pos) * self.pos_shaping_factor
        state = state.replace(scenario=scratch)
        scratch = dict(state.scenario)
        scratch["rot_shaping_pre"] = self._middle_angle_dist(state) * self.rot_shaping_factor
        for k in ["rew", "pos_rew", "rot_rew", "collision_rew", "energy_rew"]:
            scratch[k] = jnp.zeros((B,), jnp.float32)
        scratch["just_passed"] = jnp.zeros((B,), bool)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        if self.use_vel_controller:
            vc = self.controllers[agent.name]
            state = vc.reset(state, env_mask=safe_norm(agent.u(state)) < 1e-3)
            return vc.process_force(state)
        return state

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        B = state.batch_dim
        jl = self.joint.landmark
        scratch["t"] = scratch["t"] + 1
        joint_passed = jl.pos(state)[:, Y] > 0
        all_passed = jnp.all(
            jnp.stack([a.pos(state)[:, Y] for a in self.world.agents], axis=1)
            > self.passage_width / 2,
            axis=1,
        )

        dist_pass = safe_norm(jl.pos(state) - scratch["pass_center"]) * self.pos_shaping_factor
        pos_rew = jnp.where(~joint_passed, scratch["pos_shaping_pre"] - dist_pass, 0.0)
        scratch["pos_shaping_pre"] = dist_pass

        dist_goal = safe_norm(jl.pos(state) - self.goal.pos(state)) * self.pos_shaping_factor
        pos_rew = pos_rew + jnp.where(joint_passed, scratch["pos_shaping_post"] - dist_goal, 0.0)
        scratch["pos_shaping_post"] = dist_goal

        rot_shaping = self._middle_angle_dist(state) * self.rot_shaping_factor
        rot_rew = scratch["rot_shaping_pre"] - rot_shaping
        scratch["rot_shaping_pre"] = rot_shaping

        coll = jnp.zeros((B,), jnp.float32)
        if self.collision_reward != 0:
            bodies = self.world.agents + ([self.mass] if self.asym_package else [])
            for a in bodies:
                for p in self.collide_passages:
                    hit = self.world.get_distance(state, a, p) <= self.min_collision_distance
                    coll = coll + self.collision_reward * hit.astype(jnp.float32)
                for w in self.walls:
                    hit = self.world.get_distance(state, a, w) <= self.min_collision_distance
                    coll = coll + self.collision_reward * hit.astype(jnp.float32)

        energy_rew = jnp.zeros((B,), jnp.float32)
        if self.energy_reward_coeff != 0:
            energy = jnp.stack(
                [
                    safe_norm(a.u(state))
                    / math.sqrt(self.world.dim_p * float((a.u_range_array[0] * a.u_multiplier_array[0]) ** 2))
                    for a in self.world.agents
                ],
                axis=1,
            ).sum(-1)
            energy_rew = -energy * self.energy_reward_coeff

        scratch["pos_rew"] = pos_rew
        scratch["rot_rew"] = rot_rew
        scratch["collision_rew"] = coll
        scratch["energy_rew"] = energy_rew
        scratch["rew"] = pos_rew + rot_rew + coll + energy_rew
        scratch["just_passed"] = all_passed & (scratch["passed"] == 0)
        scratch["passed"] = jnp.where(scratch["just_passed"], 100.0, scratch["passed"])
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        observations = [
            agent.pos(state),
            agent.vel(state),
            agent.pos(state) - self.goal.pos(state),
            agent.pos(state) - state.scenario["big_passage_pos"],
            agent.pos(state) - state.scenario["small_passage_pos"],
            angle_to_vector(self.goal.rot(state)),
        ]
        if self.observe_joint_angle:
            joint_angle = self.joint.landmark.rot(state)
            if self.joint_angle_obs_noise:
                joint_angle = joint_angle + (
                    jax.random.normal(self.obs_key(state, 100 + agent.slot), joint_angle.shape)
                    * self.joint_angle_obs_noise
                )
            observations.append(angle_to_vector(joint_angle))
        if self.obs_noise > 0:
            observations = [
                o + jax.random.uniform(
                    self.obs_key(state, agent.slot * 20 + i), o.shape,
                    minval=-self.obs_noise, maxval=self.obs_noise,
                )
                for i, o in enumerate(observations)
            ]
        return jnp.concatenate(observations, axis=-1)

    def done(self, state):
        jl = self.joint.landmark
        return (safe_norm(jl.pos(state) - self.goal.pos(state)) <= 0.01) & (
            get_line_angle_dist_0_180(jl.rot(state), self.goal.rot(state)) <= 0.01
        )

    def info(self, agent, state):
        s = state.scenario
        return {
            "pos_rew": s["pos_rew"],
            "rot_rew": s["rot_rew"],
            "collision_rew": s["collision_rew"],
            "energy_rew": s["energy_rew"],
            "passed": s["just_passed"].astype(jnp.int32),
        }

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs) for the default zero-coefficient reward config;
        returns None otherwise. Per-env targets (pass_center, the passage
        landmarks' remembered positions, middle_angle) ride in as scratch
        rows; observation noise is applied in unpack with the hook's keys."""
        if self.collision_reward != 0 or self.energy_reward_coeff != 0:
            return None
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        jl_i = self.joint.landmark.index
        goal_i = self.goal.index
        pw_half = self.passage_width / 2
        pos_f = float(self.pos_shaping_factor)
        rot_f = float(self.rot_shaping_factor)
        mid_180 = bool(self.middle_angle_180)
        obs_joint = bool(self.observe_joint_angle)
        j_noise = float(self.joint_angle_obs_noise)
        noise = float(self.obs_noise)
        scenario = self
        # pos2 vel2 goal_rel2 big_rel2 small_rel2 goal_vec2 [joint_angle 1]
        obs_w = 12 + (1 if obs_joint else 0)

        class JointPassageSizeOutputs(F_.FusedOutputs):
            # pos_shaping_pre/post, rot_shaping_pre, passed,
            # pass_center xy, middle_angle, big/small passage xy
            n_scratch_in = 11
            n_out = A * obs_w + 9
            # rows-carried rollout: process_action is a no-op with the
            # controller off (the default); the 4 step-varying scratch rows
            # come from the emitted shaping/passed rows, the 7 map rows
            # (pass_center/middle_angle/passage positions) are chosen at
            # reset and carried unchanged (None). Noise-free configs only.
            process_action_noop = not scenario.use_vel_controller
            # the "t" clock is a write-only step counter: the rows rollout
            # sets it to t0 + horizon at the end (bitwise the hook path's
            # unit increments — exact integer f32 adds)
            step_count_keys = ("t",)
            # noisy-obs / noisy-joint-angle configs declare the per-step
            # obs-key read
            carry_extra_idx = (
                A * obs_w + 3, A * obs_w + 4, A * obs_w + 5,
                A * obs_w + 6,
            ) + (None,) * 7
            unpack_reads = (
                ("obs_key",) if (noise > 0 or j_noise > 0) else ()
            )
            if True:  # (indent kept)
                if scenario.use_vel_controller:
                    # PID velocity controller realized in-kernel, exactly
                    # like joint_passage's (process_action above: masked
                    # PID-memory reset + process_force)
                    n_ctrl = 4 * A
                    n_ctrl_out = 2 * A
                    ctrl_u_idx = tuple(
                        (A * obs_w + 9 + 2 * i, A * obs_w + 9 + 2 * i + 1)
                        for i in range(A)
                    )
                    _pids = [
                        scenario.controllers[a.name].rows_step()
                        for a in agents
                    ]

                    @staticmethod
                    def ctrl_rows(state):
                        rows = []
                        for a in agents:
                            cs = state.scenario[f"__vel_ctrl_{a.name}"]
                            rows += [
                                cs["accum_errs"][:, 0],
                                cs["accum_errs"][:, 1],
                                cs["prev_err"][:, 0], cs["prev_err"][:, 1],
                            ]
                        return jnp.stack(rows, axis=0)

                    @staticmethod
                    def ctrl_updates(rows, scenario_scratch):
                        out = {}
                        for i, a in enumerate(agents):
                            r = rows[4 * i : 4 * (i + 1)]
                            out[f"__vel_ctrl_{a.name}"] = {
                                "accum_errs": jnp.stack(
                                    [r[0], r[1]], axis=-1
                                ),
                                "prev_err": jnp.stack(
                                    [r[2], r[3]], axis=-1
                                ),
                            }
                        return out

                    def process_act_rows(ctx, _pids=_pids):
                        fx, fy = ctx["fx"], ctx["fy"]
                        vx, vy = ctx["vx"], ctx["vy"]
                        ctrl = ctx["ctrl"]
                        out_rows = []
                        for i, a in enumerate(agents):
                            e = a.index
                            ux, uy = fx[e], fy[e]
                            reset_m = F_._norm(ux, uy) < 1e-3
                            acx, acy, prx, pry = ctrl[4 * i : 4 * (i + 1)]
                            ox, oy, acx, acy, prx, pry = _pids[i](
                                ux, uy, vx[e], vy[e],
                                acx, acy, prx, pry, reset_m,
                            )
                            fx[e], fy[e] = ox, oy
                            (
                                ctrl[4 * i], ctrl[4 * i + 1],
                                ctrl[4 * i + 2], ctrl[4 * i + 3],
                            ) = (acx, acy, prx, pry)
                            out_rows += [ox, oy]
                        return out_rows

                    process_act_rows = staticmethod(process_act_rows)

            @staticmethod
            def scratch_rows(state):
                s = state.scenario
                return jnp.stack(
                    [
                        s["pos_shaping_pre"], s["pos_shaping_post"],
                        s["rot_shaping_pre"], s["passed"],
                        s["pass_center"][:, 0], s["pass_center"][:, 1],
                        s["middle_angle"],
                        s["big_passage_pos"][:, 0], s["big_passage_pos"][:, 1],
                        s["small_passage_pos"][:, 0],
                        s["small_passage_pos"][:, 1],
                    ],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                (pp_pre, pp_post, rp_pre, passed,
                 pc_x, pc_y, mid, big_x, big_y,
                 small_x, small_y) = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                def dist_180(a, b):
                    a = jnp.mod(a, jnp.pi)
                    b = jnp.mod(b, jnp.pi)
                    return jnp.minimum(
                        jnp.abs(a - b),
                        jnp.minimum(
                            jnp.abs(a - (b - jnp.pi)), jnp.abs((a - jnp.pi) - b)
                        ),
                    )

                joint_passed = py[jl_i] > 0
                all_passed = None
                for a in agents:
                    ok = py[a.index] > pw_half
                    all_passed = ok if all_passed is None else (all_passed & ok)

                dist_pass = safe_norm2(px[jl_i] - pc_x, py[jl_i] - pc_y) * pos_f
                pos_rew = jnp.where(~joint_passed, pp_pre - dist_pass, 0.0)
                dist_goal_raw = safe_norm2(
                    px[jl_i] - px[goal_i], py[jl_i] - py[goal_i]
                )
                dist_goal = dist_goal_raw * pos_f
                pos_rew = pos_rew + jnp.where(joint_passed, pp_post - dist_goal, 0.0)

                if mid_180:
                    rot_shaping = dist_180(rot[jl_i], mid) * rot_f
                else:
                    rot_shaping = -(
                        jnp.cos(rot[jl_i]) * jnp.cos(mid)
                        + jnp.sin(rot[jl_i]) * jnp.sin(mid)
                    ) * rot_f
                rot_rew = rp_pre - rot_shaping

                rew = pos_rew + rot_rew
                just_passed = all_passed & (passed == 0)
                passed_new = jnp.where(just_passed, 100.0, passed)
                done = (dist_goal_raw <= 0.01) & (
                    dist_180(rot[jl_i], rot[goal_i]) <= 0.01
                )

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    rows += [px[ai] - px[goal_i], py[ai] - py[goal_i]]
                    rows += [px[ai] - big_x, py[ai] - big_y]
                    rows += [px[ai] - small_x, py[ai] - small_y]
                    rows += [jnp.cos(rot[goal_i]), jnp.sin(rot[goal_i])]
                    if obs_joint:
                        rows.append(rot[jl_i])  # unpack adds noise, then
                        # maps through angle_to_vector
                rows += [
                    rew, pos_rew, rot_rew,
                    dist_pass, dist_goal, rot_shaping, passed_new,
                ]
                rows.append(just_passed.astype(jnp.float32))
                rows.append(done.astype(jnp.float32))
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                rew = extra[base]
                pos_rew = extra[base + 1]
                rot_rew = extra[base + 2]
                pp_pre, pp_post = extra[base + 3], extra[base + 4]
                rp_pre = extra[base + 5]
                passed = extra[base + 6]
                just_passed = extra[base + 7] > 0.5
                done = extra[base + 8] > 0.5
                B = state.batch_dim
                obs = []
                for s_, a in enumerate(agents):
                    o = extra[s_ * obs_w : (s_ + 1) * obs_w]
                    parts = [o[0:2].T, o[2:4].T, o[4:6].T, o[6:8].T,
                             o[8:10].T, o[10:12].T]
                    c = 12
                    if obs_joint:
                        angle = o[c]
                        if j_noise:
                            angle = angle + (
                                jax.random.normal(
                                    scenario.obs_key(state, 100 + a.slot),
                                    angle.shape,
                                )
                                * j_noise
                            )
                        parts.append(
                            jnp.stack([jnp.cos(angle), jnp.sin(angle)], -1)
                        )
                    if noise > 0:
                        parts = [
                            p
                            + jax.random.uniform(
                                scenario.obs_key(state, a.slot * 20 + k),
                                p.shape, minval=-noise, maxval=noise,
                            )
                            for k, p in enumerate(parts)
                        ]
                    obs.append(jnp.concatenate(parts, -1))
                zeros = jnp.zeros((B,), jnp.float32)
                updates = {
                    "t": state.scenario["t"] + 1,
                    "rew": rew, "pos_rew": pos_rew, "rot_rew": rot_rew,
                    "collision_rew": zeros, "energy_rew": zeros,
                    "pos_shaping_pre": pp_pre, "pos_shaping_post": pp_post,
                    "rot_shaping_pre": rp_pre,
                    "passed": passed, "just_passed": just_passed,
                }
                rews = tuple(rew for _ in range(A))
                return tuple(obs), rews, done, updates

        return JointPassageSizeOutputs()

    def extra_render(self, env, ax, env_index: int = 0):
        """Goal circles at the two joint endpoints (reference
        joint_passage_size.py extra_render)."""
        import numpy as np

        from vmas_tpu.render import draw

        p = np.asarray(self.goal.pos(env.state)[env_index])
        r = float(np.asarray(self.goal.rot(env.state)[env_index]).reshape(-1)[0])
        d = self.joint_length / 2 * np.array([np.cos(r), np.sin(r)])
        for end in (p - d, p + d):
            draw.draw_circle(ax, end, self.agent_radius, self.goal.color, filled=True)
