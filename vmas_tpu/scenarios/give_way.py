"""Give-way scenario (corridor swap with PID velocity control).

Behavioral reference: /root/reference/vmas/scenarios/give_way.py. Two agents
in a corridor must swap ends; one must yield into the asymmetric passage.
The reference's per-agent ``input_queue`` action delay becomes a [D, B, 2]
scratch buffer; PID controller state lives in scratch via VelocityController.
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
        self.v_range = kwargs.pop("v_range", 0.5)
        self.a_range = kwargs.pop("a_range", 1)
        self.obs_noise = kwargs.pop("obs_noise", 0)
        self.box_agents = kwargs.pop("box_agents", False)
        self.linear_friction = kwargs.pop("linear_friction", 0.1)
        self.mirror_passage = kwargs.pop("mirror_passage", False)
        self.done_on_completion = kwargs.pop("done_on_completion", False)
        self.observe_rel_pos = kwargs.pop("observe_rel_pos", False)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1.0)
        self.final_reward = kwargs.pop("final_reward", 0.01)
        self.energy_reward_coeff = kwargs.pop("energy_rew_coeff", 0)
        self.agent_collision_penalty = kwargs.pop("agent_collision_penalty", 0)
        self.passage_collision_penalty = kwargs.pop("passage_collision_penalty", 0)
        self.obstacle_collision_penalty = kwargs.pop("obstacle_collision_penalty", 0)
        self.use_velocity_controller = kwargs.pop("use_velocity_controller", True)
        self.min_input_norm = kwargs.pop("min_input_norm", 0.08)
        self.dt_delay = kwargs.pop("dt_delay", 0)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.viewer_size = (1600, 700)
        controller_params = [2, 6, 0.002]
        self.f_range = self.a_range + self.linear_friction
        self.u_range = self.v_range if self.use_velocity_controller else self.f_range

        world = World(
            batch_dim, device, drag=0, dt=0.05,
            linear_friction=self.linear_friction,
            substeps=16 if self.box_agents else 5,
            collision_force=10000 if self.box_agents else 500,
        )

        self.agent_radius = 0.16
        self.agent_box_length = 0.32
        self.agent_box_width = 0.24
        self.spawn_pos_noise = 0.02
        self.min_collision_distance = 0.005

        def agent_shape():
            return (
                Sphere(radius=self.agent_radius)
                if not self.box_agents
                else Box(length=self.agent_box_length, width=self.agent_box_width)
            )

        self.controllers = {}
        for i, color in enumerate([Color.BLUE, Color.GREEN]):
            agent = Agent(
                name=f"agent_{i}", color=color, rotatable=False,
                linear_friction=self.linear_friction, shape=agent_shape(),
                u_range=self.u_range, f_range=self.f_range, v_range=self.v_range,
                render_action=True,
            )
            goal = Landmark(
                name=f"goal_{i}", collide=False,
                shape=Sphere(radius=self.agent_radius / 2), color=color,
            )
            agent.goal = goal
            world.add_agent(agent)
            world.add_landmark(goal)
            if self.use_velocity_controller:
                self.controllers[agent.name] = VelocityController(
                    agent, world, controller_params, "standard"
                )

        self.spawn_map(world)
        return world

    # ------------------------------------------------------------------
    def spawn_map(self, world: World):
        """Reference give_way.py:339-415."""
        self.scenario_length = 5
        self.passage_length = 0.4
        self.passage_width = 0.48
        self.corridor_width = self.passage_length
        self.small_ceiling_length = (self.scenario_length / 2) - (self.passage_length / 2)
        self.goal_dist_from_wall = self.agent_radius + 0.05
        self.agent_dist_from_wall = 0.5

        self.walls = []
        for i in range(2):
            lm = Landmark(name=f"wall {i}", collide=True, shape=Line(length=self.corridor_width), color=Color.BLACK)
            self.walls.append(lm)
            world.add_landmark(lm)
        self.small_ceilings_1 = []
        for i in range(2):
            lm = Landmark(name=f"ceil 1 {i}", collide=True, shape=Line(length=self.small_ceiling_length), color=Color.BLACK)
            self.small_ceilings_1.append(lm)
            world.add_landmark(lm)
        self.passage_1 = []
        for i in range(3):
            lm = Landmark(
                name=f"ceil 2 {i}", collide=True,
                shape=Line(length=self.passage_length if i == 2 else self.passage_width),
                color=Color.BLACK,
            )
            self.passage_1.append(lm)
            world.add_landmark(lm)
        self.passage_2 = []
        if self.mirror_passage:
            self.small_ceilings_2 = []
            for i in range(2):
                lm = Landmark(name=f"ceil 12 {i}", collide=True, shape=Line(length=self.small_ceiling_length), color=Color.BLACK)
                self.small_ceilings_2.append(lm)
                world.add_landmark(lm)
            for i in range(3):
                lm = Landmark(
                    name=f"ceil 22 {i}", collide=True,
                    shape=Line(length=self.passage_length if i == 2 else self.passage_width),
                    color=Color.BLACK,
                )
                self.passage_2.append(lm)
                world.add_landmark(lm)
        else:
            self.floor = Landmark(name="floor", collide=True, shape=Line(length=self.scenario_length), color=Color.BLACK)
            world.add_landmark(self.floor)

    def reset_map(self, state):
        """Reference give_way.py:417-545."""
        half = self.scenario_length / 2
        for i, lm in enumerate(self.walls):
            state = lm.set_pos(state, jnp.asarray([-half if i == 0 else half, 0.0], jnp.float32))
            state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
        small_ceiling_pos = self.small_ceiling_length / 2 - half
        for i, lm in enumerate(self.small_ceilings_1):
            state = lm.set_pos(
                state,
                jnp.asarray(
                    [-small_ceiling_pos if i == 0 else small_ceiling_pos, self.passage_length / 2],
                    jnp.float32,
                ),
            )
        for i, lm in enumerate(self.passage_1[:-1]):
            state = lm.set_pos(
                state,
                jnp.asarray(
                    [
                        -self.passage_length / 2 if i == 0 else self.passage_length / 2,
                        self.passage_length / 2 + self.passage_width / 2,
                    ],
                    jnp.float32,
                ),
            )
            state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
        state = self.passage_1[-1].set_pos(
            state, jnp.asarray([0, self.passage_length / 2 + self.passage_width], jnp.float32)
        )
        if self.mirror_passage:
            for i, lm in enumerate(self.small_ceilings_2):
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [-small_ceiling_pos if i == 0 else small_ceiling_pos, -self.passage_length / 2],
                        jnp.float32,
                    ),
                )
            for i, lm in enumerate(self.passage_2[:-1]):
                state = lm.set_pos(
                    state,
                    jnp.asarray(
                        [
                            -self.passage_length / 2 if i == 0 else self.passage_length / 2,
                            -self.passage_length / 2 - self.passage_width / 2,
                        ],
                        jnp.float32,
                    ),
                )
                state = lm.set_rot(state, jnp.asarray(math.pi / 2, jnp.float32))
            state = self.passage_2[-1].set_pos(
                state, jnp.asarray([0, -self.passage_length / 2 - self.passage_width], jnp.float32)
            )
        else:
            state = self.floor.set_pos(state, jnp.asarray([0, -self.passage_length / 2], jnp.float32))
        return state

    # ------------------------------------------------------------------
    def reset_world_at(self, state, key):
        B = state.batch_dim
        k0, k1 = jax.random.split(key)
        blue, green = self.world.agents[0], self.world.agents[1]
        start_x = self.scenario_length / 2 - self.agent_dist_from_wall
        goal_x = self.scenario_length / 2 - self.goal_dist_from_wall
        noise0 = jax.random.uniform(k0, (B, 2), minval=-self.spawn_pos_noise, maxval=self.spawn_pos_noise)
        noise1 = jax.random.uniform(k1, (B, 2), minval=-self.spawn_pos_noise, maxval=self.spawn_pos_noise)
        state = blue.set_pos(state, jnp.asarray([-start_x, 0.0], jnp.float32) + noise0)
        state = blue.goal.set_pos(state, jnp.asarray([goal_x, 0.0], jnp.float32))
        state = green.set_pos(state, jnp.asarray([start_x, 0.0], jnp.float32) + noise1)
        state = green.goal.set_pos(state, jnp.asarray([-goal_x, 0.0], jnp.float32))
        for vc in self.controllers.values():
            state = vc.reset(state)
        state = self.reset_map(state)

        scratch = dict(state.scenario)
        scratch["shaping"] = jnp.stack(
            [
                safe_norm(a.pos(state) - a.goal.pos(state)) * self.pos_shaping_factor
                for a in self.world.agents
            ],
            axis=-1,
        )
        scratch["goal_reached"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["final_rew"] = jnp.zeros((B,), jnp.float32)
        if self.dt_delay > 0:
            for a in self.world.agents:
                scratch[f"queue_{a.name}"] = jnp.zeros((self.dt_delay, B, 2), jnp.float32)
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        if not self.use_velocity_controller:
            return state
        u = agent.u(state)
        if self.dt_delay > 0:
            scratch = dict(state.scenario)
            q = scratch[f"queue_{agent.name}"]
            delayed = q[0]
            scratch[f"queue_{agent.name}"] = jnp.concatenate([q[1:], u[None]], axis=0)
            state = state.replace(scenario=scratch)
            u = delayed
        u = JaxUtils.clamp_with_norm(u, self.u_range)
        u = jnp.where((safe_norm(u) < self.min_input_norm)[:, None], 0.0, u)
        state = agent.set_u(state, u)
        vel_is_zero = safe_norm(u) < 1e-3
        vc = self.controllers[agent.name]
        state = vc.reset(state, env_mask=vel_is_zero)
        return vc.process_force(state)

    # ------------------------------------------------------------------
    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        blue, green = self.world.agents[0], self.world.agents[-1]
        blue_d = safe_norm(blue.pos(state) - blue.goal.pos(state))
        green_d = safe_norm(green.pos(state) - green.goal.pos(state))
        goal_reached = (blue_d < blue.goal.shape.radius) & (green_d < green.goal.shape.radius)
        shaping_new = jnp.stack([blue_d, green_d], axis=-1) * self.pos_shaping_factor
        scratch["pos_rew"] = (scratch["shaping"] - shaping_new).sum(-1)
        scratch["shaping"] = shaping_new
        scratch["final_rew"] = jnp.where(goal_reached, self.final_reward, 0.0)
        scratch["goal_reached"] = goal_reached
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        B = state.batch_dim
        # Zero penalties are static config: skipping the distance kernels is
        # bitwise identical (hit is 0/1, never NaN, so 0*hit == 0 exactly)
        # and erases most of the default-config reward cost.
        agent_coll = jnp.zeros((B,), jnp.float32)
        if self.agent_collision_penalty != 0:
            for a in self.world.agents:
                if a is not agent:
                    hit = self.world.get_distance(state, agent, a) <= self.min_collision_distance
                    agent_coll = agent_coll + self.agent_collision_penalty * hit.astype(jnp.float32)
        obstacle_coll = jnp.zeros((B,), jnp.float32)
        passages = [*self.passage_1, *self.passage_2] if self.mirror_passage else [*self.passage_1]
        for lm in self.world.landmarks:
            if self.world.collides(agent, lm):
                penalty = (
                    self.passage_collision_penalty if lm in passages else self.obstacle_collision_penalty
                )
                if penalty == 0:
                    continue
                hit = self.world.get_distance(state, agent, lm) <= self.min_collision_distance
                obstacle_coll = obstacle_coll + penalty * hit.astype(jnp.float32)
        if self.energy_reward_coeff != 0:
            energy = safe_norm(agent.u(state)) / math.sqrt(self.world.dim_p * (self.f_range**2))
            energy_rew = -energy * self.energy_reward_coeff
        else:
            energy_rew = jnp.zeros((B,), jnp.float32)
        return s["pos_rew"] + obstacle_coll + agent_coll + energy_rew + s["final_rew"]

    def observation(self, agent, state):
        observations = [agent.pos(state), agent.vel(state)]
        if self.observe_rel_pos:
            for a in self.world.agents:
                if a is not agent:
                    observations.append(agent.pos(state) - a.pos(state))
        if self.obs_noise > 0:
            # per-part uniform noise in [-obs_noise, obs_noise] (reference
            # give_way.py:317-323), keyed off the per-step observation key
            key = self.obs_key(state, agent.slot)
            observations = [
                obs
                + jax.random.uniform(
                    jax.random.fold_in(key, i), obs.shape,
                    minval=-self.obs_noise, maxval=self.obs_noise,
                )
                for i, obs in enumerate(observations)
            ]
        return jnp.concatenate(observations, axis=-1)

    def done(self, state):
        if self.done_on_completion:
            return state.scenario["goal_reached"]
        return jnp.zeros((state.batch_dim,), bool)

    def info(self, agent, state):
        s = state.scenario
        return {"pos_rew": s["pos_rew"], "final_rew": s["final_rew"]}

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs) for the default reward config (all penalty
        coefficients zero — their loops are statically skipped in reward()
        too); returns None otherwise so the hook pipeline runs. The PID
        velocity controller stays in process_action (pre-kernel), and the
        per-part observation noise is applied in unpack with the same keys
        as the observation hook."""
        if (
            self.agent_collision_penalty != 0
            or self.passage_collision_penalty != 0
            or self.obstacle_collision_penalty != 0
            or self.energy_reward_coeff != 0
        ):
            return None
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        goal_r = [float(a.goal.shape.radius) for a in agents]
        factor = float(self.pos_shaping_factor)
        final = float(self.final_reward)
        rel_obs = bool(self.observe_rel_pos)
        done_on = bool(self.done_on_completion)
        noise = float(self.obs_noise)
        scenario = self
        obs_w = 4 + (2 * (A - 1) if rel_obs else 0)

        u_rng = float(self.u_range)
        min_in = float(self.min_input_norm)
        ctrl_in_kernel = self.use_velocity_controller and self.dt_delay == 0
        pids = (
            [self.controllers[a.name].rows_step() for a in agents]
            if ctrl_in_kernel else None
        )

        class GiveWayOutputs(F_.FusedOutputs):
            n_scratch_in = A  # previous shaping columns
            n_out = A * obs_w + A + 3
            # rows-carried rollout: next scratch = the emitted shaping
            # rows; noisy-obs configs declare the per-step obs-key read
            # (the rollout substitutes the step pipeline's keys).
            process_action_noop = not scenario.use_velocity_controller
            carry_extra_idx = tuple(range(A * obs_w, A * obs_w + A))
            unpack_reads = ("obs_key",) if noise > 0 else ()
            if ctrl_in_kernel:
                # the DEFAULT config's PID velocity controller, realized
                # in-kernel (reference velocity_controller.py:29-124): the
                # integrator/derivative memory rides 4 carry rows per agent
                # and the controller's raw output u is emitted so the final
                # state's u matches the hook pipeline's. dt_delay > 0 keeps
                # the XLA path (its action queue is plain scratch).
                n_ctrl = 4 * A
                n_ctrl_out = 2 * A
                ctrl_u_idx = tuple(
                    (A * obs_w + A + 3 + 2 * i, A * obs_w + A + 3 + 2 * i + 1)
                    for i in range(A)
                )

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
                    # mirrors process_action above, op for op: clamp_with_norm
                    # (utils.py:79-89 — unguarded norm, guarded division),
                    # min_input_norm zeroing on the guarded norm, the masked
                    # PID-memory reset, then the PID update (rows_step)
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
                return state.scenario["shaping"].T  # [A, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                prev = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                dist = [
                    safe_norm2(
                        px[a.index] - px[a.goal.index],
                        py[a.index] - py[a.goal.index],
                    )
                    for a in agents
                ]
                goal_reached = None
                for i in range(A):
                    r = dist[i] < goal_r[i]
                    goal_reached = r if goal_reached is None else (goal_reached & r)
                shaping = [d * factor for d in dist]
                pos_rew = sum(prev[i] - shaping[i] for i in range(A))
                final_rew = jnp.where(goal_reached, final, 0.0)

                rows = []
                for a in agents:
                    rows += [px[a.index], py[a.index], vx[a.index], vy[a.index]]
                    if rel_obs:
                        for b in agents:
                            if b is not a:
                                rows += [
                                    px[a.index] - px[b.index],
                                    py[a.index] - py[b.index],
                                ]
                rows += shaping
                rows += [
                    pos_rew, final_rew, goal_reached.astype(jnp.float32)
                ]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                shaping = extra[base : base + A].T
                pos_rew = extra[base + A]
                final_rew = extra[base + A + 1]
                goal_reached = extra[base + A + 2] > 0.5
                obs = []
                for i, a in enumerate(agents):
                    o = extra[i * obs_w : (i + 1) * obs_w].T
                    if noise > 0:
                        # same per-part keys/shapes as the observation hook
                        key = scenario.obs_key(state, a.slot)
                        parts = 1 + 1 + (A - 1 if rel_obs else 0)
                        noises = [
                            jax.random.uniform(
                                jax.random.fold_in(key, k), (o.shape[0], 2),
                                minval=-noise, maxval=noise,
                            )
                            for k in range(parts)
                        ]
                        o = o + jnp.concatenate(noises, -1)
                    obs.append(o)
                rew = pos_rew + final_rew
                rews = tuple(rew for _ in range(A))
                done = (
                    goal_reached
                    if done_on
                    else jnp.zeros(goal_reached.shape, bool)
                )
                updates = {
                    "shaping": shaping,
                    "goal_reached": goal_reached,
                    "pos_rew": pos_rew,
                    "final_rew": final_rew,
                }
                return tuple(obs), rews, done, updates

        return GiveWayOutputs()
