"""Joint passage scenario (joint-linked pair maneuvers a line through a wall).

Behavioral reference: /root/reference/vmas/scenarios/joint_passage.py.

Static-shape notes:
* The joint line's dynamic collision filter (reference joint_passage.py:619-
  627) is static in both modes: with fixed_passage the open slots are
  deterministic, so "collides only with neighbours of the opening" is a
  build-time pair set; without fixed_passage the joint collides with all
  closed passage boxes (the reference's else-branch).
* The per-env random open-slot placement and the slot-skipping while loop
  (joint_passage.py:637-683) become an argsort-based per-env slot assignment.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.controllers import VelocityController
from vmas_tpu.core import Agent, Box, Color, Joint, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def get_line_angle_0_180(rot):
    return jnp.mod(rot, jnp.pi)


def get_line_angle_dist_0_180(angle, goal):
    angle = get_line_angle_0_180(angle)
    goal = get_line_angle_0_180(goal)
    return jnp.minimum(
        jnp.abs(angle - goal),
        jnp.minimum(jnp.abs(angle - (goal - jnp.pi)), jnp.abs((angle - jnp.pi) - goal)),
    )


def angle_to_vector(angle):
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_passages = kwargs.pop("n_passages", 1)
        self.fixed_passage = kwargs.pop("fixed_passage", True)
        self.joint_length = kwargs.pop("joint_length", 0.5)
        self.random_start_angle = kwargs.pop("random_start_angle", True)
        self.random_goal_angle = kwargs.pop("random_goal_angle", True)
        self.observe_joint_angle = kwargs.pop("observe_joint_angle", False)
        self.joint_angle_obs_noise = kwargs.pop("joint_angle_obs_noise", 0.0)
        self.asym_package = kwargs.pop("asym_package", True)
        self.mass_ratio = kwargs.pop("mass_ratio", 5)
        self.mass_position = kwargs.pop("mass_position", 0.75)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.rot_shaping_factor = kwargs.pop("rot_shaping_factor", 1)
        self.collision_reward = kwargs.pop("collision_reward", 0)
        self.energy_reward_coeff = kwargs.pop("energy_reward_coeff", 0)
        self.all_passed_rot = kwargs.pop("all_passed_rot", True)
        self.obs_noise = kwargs.pop("obs_noise", 0.0)
        self.use_controller = kwargs.pop("use_controller", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.plot_grid = True
        self.visualize_semidims = False

        world = World(
            batch_dim, device, x_semidim=1, y_semidim=1,
            substeps=7 if not self.asym_package else 10,
            joint_force=900 if self.asym_package else 400,
            collision_force=2500 if self.asym_package else 1500,
            drag=0.25 if not self.asym_package else 0.15,
        )
        if not self.observe_joint_angle:
            assert self.joint_angle_obs_noise == 0

        self.middle_angle = math.pi / 2
        self.n_agents = 2
        self.agent_radius = 0.03333
        self.mass_radius = self.agent_radius * (2 / 3)
        self.passage_width = 0.2
        self.passage_length = 0.1476
        self.scenario_length = 2 * world.x_semidim + 2 * self.agent_radius
        self.n_boxes = int(self.scenario_length // self.passage_length)
        self.min_collision_distance = 0.005
        assert 1 <= self.n_passages <= self.n_boxes

        controller_params = [2.0, 10, 0.00001]
        self.controllers = {}
        for i in range(2):
            agent = Agent(
                name=f"agent_{i}", shape=Sphere(self.agent_radius),
                mass=(1 if self.asym_package or i == 0 else self.mass_ratio),
                color=Color.BLUE if i == 1 else Color.BLUE,
                max_speed=self.max_speed_1 if i == 1 else None,
                obs_noise=self.obs_noise, render_action=True,
                u_multiplier=0.8, f_range=0.8,
            )
            self.controllers[agent.name] = VelocityController(agent, world, controller_params, "standard")
            world.add_agent(agent)

        self.joint = Joint(
            world.agents[0], world.agents[1],
            anchor_a=(0, 0), anchor_b=(0, 0), dist=self.joint_length,
            rotate_a=True, rotate_b=True, collidable=True, width=0, mass=1,
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
                name=f"wall {i}", collide=True,
                shape=Line(length=2 + self.agent_radius * 2), color=Color.BLACK,
            )
            world.add_landmark(wall)
            self.walls.append(wall)

        self.create_passage_map(world)
        return world

    # ------------------------------------------------------------------
    def _fixed_open_slots(self):
        slots = []
        j = self.n_boxes // 2
        for i in range(self.n_passages):
            j += i * (-1 if i % 2 == 0 else 1)
            slots.append(j)
        return slots

    def create_passage_map(self, world):
        self.passages = []
        self.collide_passages = []
        self.non_collide_passages = []

        def removed(i):
            return (self.n_boxes // 2) - self.n_passages / 2 <= i < (self.n_boxes // 2) + self.n_passages / 2

        for i in range(self.n_boxes):
            passage = Landmark(
                name=f"passage {i}", collide=not removed(i), movable=False,
                shape=Box(length=self.passage_length, width=self.passage_width),
                color=Color.RED,
                collision_filter=lambda e: not isinstance(e.shape, Box),
            )
            (self.collide_passages if passage.collide else self.non_collide_passages).append(passage)
            self.passages.append(passage)
            world.add_landmark(passage)

        # Static joint-line collision filter (see module docstring).
        if self.fixed_passage:
            open_slots = set(self._fixed_open_slots())
            # collide passages occupy remaining slots in order
            slot_iter = (s for s in range(self.n_boxes + self.n_passages) if s not in open_slots)
            neighbour_names = set()
            for p in self.collide_passages:
                s = next(slot_iter)
                if (s - 1) in open_slots or (s + 1) in open_slots:
                    neighbour_names.add(p.name)

            def joint_collides(e):
                return e.name in neighbour_names

        else:
            collide_names = {p.name for p in self.collide_passages}

            def joint_collides(e):
                return e.name in collide_names

        self.joint.landmark.collision_filter = joint_collides

    def _slot_pos(self, i):
        """World position of passage slot index i ([B] or scalar)."""
        x = -1 - self.agent_radius + self.passage_length / 2 + self.passage_length * i
        return jnp.stack([x, jnp.zeros_like(x)], axis=-1)

    def spawn_passage_map(self, state, key):
        B = state.batch_dim
        if self.fixed_passage:
            open_idx = jnp.broadcast_to(
                jnp.asarray(self._fixed_open_slots(), jnp.int32), (B, self.n_passages)
            )
        else:
            open_idx = jax.random.randint(key, (B, self.n_passages), 0, self.n_boxes - 1)

        for k, passage in enumerate(self.non_collide_passages):
            state = passage.set_rendering(state, False)
            state = passage.set_pos(state, self._slot_pos(open_idx[:, k].astype(jnp.float32)))

        # Assign collide passages to the remaining slots in ascending order
        # (mirrors the reference's skip-while loop incl. overflow slots).
        n_total = self.n_boxes + self.n_passages
        arr = jnp.arange(n_total)
        blocked = jnp.any(arr[None, :, None] == open_idx[:, None, :], axis=-1)  # [B, n_total]
        order = jnp.argsort(jnp.where(blocked, n_total + arr, arr), axis=-1)  # unblocked first, ascending
        for k, passage in enumerate(self.collide_passages):
            slot = order[:, k].astype(jnp.float32)
            state = passage.set_pos(state, self._slot_pos(slot))
        return state

    def spawn_walls(self, state):
        for i, wall in enumerate(self.walls):
            x = 0.0 if i % 2 else (1 + self.agent_radius if i == 0 else -1 - self.agent_radius)
            y = 0.0 if not i % 2 else (1 + self.agent_radius if i == 1 else -1 - self.agent_radius)
            state = wall.set_pos(state, jnp.asarray([x, y], jnp.float32))
            state = wall.set_rot(state, jnp.asarray(math.pi / 2 if not i % 2 else 0.0, jnp.float32))
        return state

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        B = state.batch_dim
        ks = jax.random.split(key, 6)
        lim_s = jnp.pi / 2 if self.random_start_angle else 0.0
        lim_g = jnp.pi / 2 if self.random_goal_angle else 0.0
        start_angle = jax.random.uniform(ks[0], (B,), minval=-lim_s, maxval=lim_s)
        goal_angle = jax.random.uniform(ks[1], (B,), minval=-lim_g, maxval=lim_g)

        sdx = (self.joint_length / 2) * jnp.cos(start_angle)
        sdy = (self.joint_length / 2) * jnp.sin(start_angle)
        gdx = (self.joint_length / 2) * jnp.cos(goal_angle)
        gdy = (self.joint_length / 2) * jnp.sin(goal_angle)

        min_x_s = -1 + (self.agent_radius + jnp.abs(sdx))
        max_x_s = 1 - (self.agent_radius + jnp.abs(sdx))
        min_y_s = -1 + (self.agent_radius + jnp.abs(sdy))
        max_y_s = -2 * self.agent_radius - self.passage_width / 2 - jnp.abs(sdy)
        min_x_g = -1 + (self.agent_radius + jnp.abs(gdx))
        max_x_g = 1 - (self.agent_radius + jnp.abs(gdx))
        min_y_g = 2 * self.agent_radius + self.passage_width / 2 + jnp.abs(gdy)
        max_y_g = 1 - (self.agent_radius + jnp.abs(gdy))

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
        swap = jax.random.bernoulli(ks[4], 0.5, (B,))
        sign = jnp.where(swap, -1.0, 1.0)[:, None]
        for agent in self.world.agents:
            state = self.controllers[agent.name].reset(state)
        state = self.world.agents[0].set_pos(state, joint_pos - sign * delta)
        state = self.world.agents[1].set_pos(state, joint_pos + sign * delta)
        if self.asym_package:
            state = self.mass.set_pos(state, joint_pos + self.mass_position * delta * sign)

        state = self.spawn_passage_map(state, ks[5])
        state = self.spawn_walls(state)
        state = self.world.sync_joints(state)

        jl = self.joint.landmark
        scratch = dict(state.scenario)
        scratch["passed"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_shaping_pre"] = (
            jnp.min(
                jnp.stack(
                    [safe_norm(jl.pos(state) - p.pos(state)) for p in self.non_collide_passages],
                    axis=1,
                ),
                axis=1,
            )
            * self.pos_shaping_factor
        )
        scratch["pos_shaping_post"] = safe_norm(jl.pos(state) - goal_pos) * self.pos_shaping_factor
        scratch["rot_shaping_pre"] = (
            get_line_angle_dist_0_180(jl.rot(state), self.middle_angle) * self.rot_shaping_factor
        )
        scratch["rot_shaping_post"] = (
            get_line_angle_dist_0_180(jl.rot(state), goal_angle) * self.rot_shaping_factor
        )
        for k in ["rew", "pos_rew", "rot_rew", "collision_rew", "energy_rew"]:
            scratch[k] = jnp.zeros((B,), jnp.float32)
        scratch["just_passed"] = jnp.zeros((B,), bool)
        return state.replace(scenario=scratch)

    # ------------------------------------------------------------------
    def process_action(self, agent, state):
        if self.use_controller:
            vc = self.controllers[agent.name]
            state = vc.reset(state, env_mask=safe_norm(agent.u(state)) < 1e-3)
            return vc.process_force(state)
        return state

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        B = state.batch_dim
        jl = self.joint.landmark
        joint_passed = jl.pos(state)[:, Y] > 0
        all_passed = jnp.all(
            jnp.stack([a.pos(state)[:, Y] for a in self.world.agents], axis=1)
            > self.passage_width / 2,
            axis=1,
        )

        dist_pass = jnp.min(
            jnp.stack(
                [safe_norm(jl.pos(state) - p.pos(state)) for p in self.non_collide_passages],
                axis=1,
            ),
            axis=1,
        )
        shaping = dist_pass * self.pos_shaping_factor
        pos_rew = jnp.where(~joint_passed, scratch["pos_shaping_pre"] - shaping, 0.0)
        scratch["pos_shaping_pre"] = shaping

        dist_goal = safe_norm(jl.pos(state) - self.goal.pos(state))
        shaping = dist_goal * self.pos_shaping_factor
        pos_rew = pos_rew + jnp.where(joint_passed, scratch["pos_shaping_post"] - shaping, 0.0)
        scratch["pos_shaping_post"] = shaping

        rot_passed = all_passed if self.all_passed_rot else joint_passed
        dist_rot = get_line_angle_dist_0_180(jl.rot(state), self.middle_angle)
        shaping = dist_rot * self.rot_shaping_factor
        rot_rew = jnp.where(~rot_passed, scratch["rot_shaping_pre"] - shaping, 0.0)
        scratch["rot_shaping_pre"] = shaping

        dist_rot_goal = get_line_angle_dist_0_180(jl.rot(state), self.goal.rot(state))
        shaping = dist_rot_goal * self.rot_shaping_factor
        rot_rew = rot_rew + jnp.where(rot_passed, scratch["rot_shaping_post"] - shaping, 0.0)
        scratch["rot_shaping_post"] = shaping

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
            for p in self.collide_passages:
                hit = self.world.get_distance(state, p, jl) <= self.min_collision_distance
                coll = coll + self.collision_reward * hit.astype(jnp.float32)

        energy_rew = jnp.zeros((B,), jnp.float32)
        if self.energy_reward_coeff != 0:
            energy = jnp.stack(
                [safe_norm(a.u(state)) / math.sqrt(self.world.dim_p * (0.8**2)) for a in self.world.agents],
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
        jl = self.joint.landmark
        passage_obs = [agent.pos(state) - p.pos(state) for p in self.non_collide_passages]
        observations = [
            agent.pos(state),
            agent.vel(state),
            agent.pos(state) - self.goal.pos(state),
            *passage_obs,
            angle_to_vector(self.goal.rot(state)),
        ]
        if self.observe_joint_angle:
            joint_angle = jl.rot(state)
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

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs) for the default reward config (zero
        collision/energy coefficients — their loops are statically skipped
        in pre_rewards too); returns None otherwise. Observation noise (per
        part, and the joint-angle gaussian) is applied in unpack with the
        same keys as the observation hook."""
        if self.collision_reward != 0 or self.energy_reward_coeff != 0:
            return None
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        jl_i = self.joint.landmark.index
        goal_i = self.goal.index
        open_idx = [p.index for p in self.non_collide_passages]
        pw_half = self.passage_width / 2
        pos_f = float(self.pos_shaping_factor)
        rot_f = float(self.rot_shaping_factor)
        middle = float(self.middle_angle)
        all_rot = bool(self.all_passed_rot)
        obs_joint = bool(self.observe_joint_angle)
        j_noise = float(self.joint_angle_obs_noise)
        noise = float(self.obs_noise)
        scenario = self
        # pos2 vel2 goal-rel2 passages 2P goal-angle-vec2 [joint angle 1]
        obs_w = 6 + 2 * len(open_idx) + 2 + (1 if obs_joint else 0)

        class JointPassageOutputs(F_.FusedOutputs):
            # pos_shaping_pre/post, rot_shaping_pre/post, passed
            n_scratch_in = 5
            # rew, pos_rew, rot_rew, 4 shapings, passed, just_passed, done
            n_out = A * obs_w + 10
            # rows-carried rollout: process_action is a no-op with the
            # controller off (the default); next scratch = the emitted
            # shaping/passed rows. Obs noise keys are step-varying state,
            # so declare only for the noise-free configs.
            process_action_noop = not scenario.use_controller
            # noisy-obs / noisy-joint-angle configs declare the per-step
            # obs-key read (the rollout substitutes the step pipeline's
            # keys into unpack)
            carry_extra_idx = tuple(A * obs_w + 3 + k for k in range(5))
            unpack_reads = (
                ("obs_key",) if (noise > 0 or j_noise > 0) else ()
            )
            if True:  # (indent kept)
                if scenario.use_controller:
                    # the PID velocity controller realized in-kernel
                    # (process_action above: masked PID-memory reset +
                    # process_force, reference velocity_controller.py:29-124
                    # — no input clamp in this scenario); raw controller u
                    # emitted so the final state's u matches the hook path
                    n_ctrl = 4 * A
                    n_ctrl_out = 2 * A
                    ctrl_u_idx = tuple(
                        (A * obs_w + 10 + 2 * i, A * obs_w + 10 + 2 * i + 1)
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
                                "prev_err": jnp.stack([r[2], r[3]], axis=-1),
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
                        s["rot_shaping_pre"], s["rot_shaping_post"],
                        s["passed"],
                    ],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                pp_pre, pp_post, rp_pre, rp_post, passed = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                def angle_dist(a, b):
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

                dist_pass = None
                for pi in open_idx:
                    d = safe_norm2(px[jl_i] - px[pi], py[jl_i] - py[pi])
                    dist_pass = d if dist_pass is None else jnp.minimum(dist_pass, d)
                shaping = dist_pass * pos_f
                pos_rew = jnp.where(~joint_passed, pp_pre - shaping, 0.0)
                pp_pre_new = shaping

                dist_goal = safe_norm2(px[jl_i] - px[goal_i], py[jl_i] - py[goal_i])
                shaping = dist_goal * pos_f
                pos_rew = pos_rew + jnp.where(joint_passed, pp_post - shaping, 0.0)
                pp_post_new = shaping

                rot_passed = all_passed if all_rot else joint_passed
                shaping = angle_dist(rot[jl_i], middle) * rot_f
                rot_rew = jnp.where(~rot_passed, rp_pre - shaping, 0.0)
                rp_pre_new = shaping
                dist_rot_goal = angle_dist(rot[jl_i], rot[goal_i])
                shaping = dist_rot_goal * rot_f
                rot_rew = rot_rew + jnp.where(rot_passed, rp_post - shaping, 0.0)
                rp_post_new = shaping

                rew = pos_rew + rot_rew
                just_passed = all_passed & (passed == 0)
                passed_new = jnp.where(just_passed, 100.0, passed)
                done = (dist_goal <= 0.01) & (dist_rot_goal <= 0.01)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    rows += [px[ai] - px[goal_i], py[ai] - py[goal_i]]
                    for pi in open_idx:
                        rows += [px[ai] - px[pi], py[ai] - py[pi]]
                    rows += [jnp.cos(rot[goal_i]), jnp.sin(rot[goal_i])]
                    if obs_joint:
                        rows.append(rot[jl_i])  # raw; unpack adds noise,
                        # then maps through angle_to_vector
                rows += [
                    rew, pos_rew, rot_rew,
                    pp_pre_new, pp_post_new, rp_pre_new, rp_post_new,
                    passed_new,
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
                rp_pre, rp_post = extra[base + 5], extra[base + 6]
                passed = extra[base + 7]
                just_passed = extra[base + 8] > 0.5
                done = extra[base + 9] > 0.5
                B = state.batch_dim
                obs = []
                for s_, a in enumerate(agents):
                    o = extra[s_ * obs_w : (s_ + 1) * obs_w]  # [obs_w, B]
                    parts = [
                        o[0:2].T, o[2:4].T, o[4:6].T,
                    ]
                    c = 6
                    for _ in open_idx:
                        parts.append(o[c : c + 2].T)
                        c += 2
                    parts.append(o[c : c + 2].T)
                    c += 2
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
                    "rew": rew, "pos_rew": pos_rew, "rot_rew": rot_rew,
                    "collision_rew": zeros, "energy_rew": zeros,
                    "pos_shaping_pre": pp_pre, "pos_shaping_post": pp_post,
                    "rot_shaping_pre": rp_pre, "rot_shaping_post": rp_post,
                    "passed": passed, "just_passed": just_passed,
                }
                rews = tuple(rew for _ in range(A))
                return tuple(obs), rews, done, updates

        return JointPassageOutputs()

    def info(self, agent, state):
        s = state.scenario
        return {
            "pos_rew": s["pos_rew"],
            "rot_rew": s["rot_rew"],
            "collision_rew": s["collision_rew"],
            "energy_rew": s["energy_rew"],
            "passed": s["just_passed"].astype(jnp.int32),
        }

    def extra_render(self, env, ax, env_index: int = 0):
        """Goal circles at the two joint endpoints (reference
        joint_passage.py extra_render)."""
        import numpy as np

        from vmas_tpu.render import draw

        p = np.asarray(self.goal.pos(env.state)[env_index])
        r = float(np.asarray(self.goal.rot(env.state)[env_index]).reshape(-1)[0])
        d = self.joint_length / 2 * np.array([np.cos(r), np.sin(r)])
        for end in (p - d, p + d):
            draw.draw_circle(ax, end, self.agent_radius, self.goal.color, filled=True)
