"""Balance scenario.

Behavioral reference: /root/reference/vmas/scenarios/balance.py. N agents
carry a line with a heavy sphere package on top, against gravity, toward a
goal; falling to the floor ends the episode with a penalty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import Y, safe_norm
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 3)
        self.package_mass = kwargs.pop("package_mass", 5)
        self.random_package_pos_on_line = kwargs.pop("random_package_pos_on_line", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert self.n_agents > 1

        self.line_length = 0.8
        self.agent_radius = 0.03
        self.shaping_factor = 100
        self.fall_reward = -10
        self.visualize_semidims = False

        world = World(batch_dim, device, gravity=(0.0, -0.05), y_semidim=1)
        for i in range(self.n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(self.agent_radius), u_multiplier=0.7)
            )
        self.goal = Landmark(name="goal", collide=False, shape=Sphere(), color=Color.LIGHT_GREEN)
        world.add_landmark(self.goal)
        self.package = Landmark(
            name="package", collide=True, movable=True, shape=Sphere(),
            mass=self.package_mass, color=Color.RED,
        )
        self.package.goal = self.goal
        world.add_landmark(self.package)
        self.line = Landmark(
            name="line", shape=Line(length=self.line_length), collide=True,
            movable=True, rotatable=True, mass=5, color=Color.BLACK,
        )
        world.add_landmark(self.line)
        self.floor = Landmark(name="floor", collide=True, shape=Box(length=10, width=1), color=Color.WHITE)
        world.add_landmark(self.floor)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3 = jax.random.split(key, 3)
        goal_pos = jnp.stack(
            [
                jax.random.uniform(k1, (B,), minval=-1.0, maxval=1.0),
                jax.random.uniform(jax.random.fold_in(k1, 1), (B,), minval=0.0, maxval=self.world.y_semidim),
            ],
            axis=-1,
        )
        line_x = jax.random.uniform(
            k2, (B,), minval=-1.0 + self.line_length / 2, maxval=1.0 - self.line_length / 2
        )
        line_pos = jnp.stack(
            [line_x, jnp.full((B,), -self.world.y_semidim + self.agent_radius * 2)], axis=-1
        )
        if self.random_package_pos_on_line:
            rel_x = jax.random.uniform(
                k3, (B,),
                minval=-self.line_length / 2 + self.package.shape.radius,
                maxval=self.line_length / 2 - self.package.shape.radius,
            )
        else:
            rel_x = jnp.zeros((B,))
        package_rel = jnp.stack([rel_x, jnp.full((B,), self.package.shape.radius)], axis=-1)

        for i, agent in enumerate(self.world.agents):
            offset = jnp.asarray(
                [
                    -(self.line_length - agent.shape.radius) / 2
                    + i * (self.line_length - agent.shape.radius) / (self.n_agents - 1),
                    -self.agent_radius * 2,
                ],
                jnp.float32,
            )
            state = agent.set_pos(state, line_pos + offset[None])

        state = self.line.set_pos(state, line_pos)
        state = self.goal.set_pos(state, goal_pos)
        state = self.package.set_pos(state, line_pos + package_rel)
        state = self.floor.set_pos(
            state,
            jnp.asarray(
                [0.0, -self.world.y_semidim - self.floor.shape.width / 2 - self.agent_radius],
                jnp.float32,
            ),
        )

        scratch = dict(state.scenario)
        scratch["on_the_ground"] = self._compute_on_the_ground(state)
        scratch["global_shaping"] = (
            safe_norm(self.package.pos(state) - self.goal.pos(state)) * self.shaping_factor
        )
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["ground_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def _compute_on_the_ground(self, state):
        return self.world.is_overlapping(state, self.line, self.floor) | self.world.is_overlapping(
            state, self.package, self.floor
        )

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        on_ground = self._compute_on_the_ground(state)
        package_dist = safe_norm(self.package.pos(state) - self.goal.pos(state))
        scratch["on_the_ground"] = on_ground
        scratch["ground_rew"] = jnp.where(on_ground, float(self.fall_reward), 0.0)
        global_shaping = package_dist * self.shaping_factor
        scratch["pos_rew"] = scratch["global_shaping"] - global_shaping
        scratch["global_shaping"] = global_shaping
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["ground_rew"] + state.scenario["pos_rew"]

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                agent.pos(state) - self.package.pos(state),
                agent.pos(state) - self.line.pos(state),
                self.package.pos(state) - self.goal.pos(state),
                self.package.vel(state),
                self.line.vel(state),
                self.line.ang_vel(state)[:, None],
                jnp.mod(self.line.rot(state), jnp.pi)[:, None],
            ],
            axis=-1,
        )

    def done(self, state):
        return state.scenario["on_the_ground"] | self.world.is_overlapping(
            state, self.package, self.goal
        )

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "ground_rew": state.scenario["ground_rew"]}

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). Mirrors pre_rewards/observation/done above
        line for line; asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A = len(agents)
        goal_i = self.goal.index
        pkg_i = self.package.index
        line_i = self.line.index
        floor_i = self.floor.index
        pkg_r = float(self.package.shape.radius)
        goal_r = float(self.goal.shape.radius)
        line_half = self.line.shape.length / 2
        floor_hw = self.floor.shape.width / 2
        floor_hl = self.floor.shape.length / 2
        factor = float(self.shaping_factor)
        fall_rew = float(self.fall_reward)
        # per-agent rows: pos(2) vel(2) pos-pkg(2) pos-line(2); shared rows:
        # pkg-goal(2) pkg.vel(2) line.vel(2) line.ang_vel(1) mod(rot,pi)(1)
        agent_w, shared_w = 8, 8

        class BalanceOutputs(F.FusedOutputs):
            n_scratch_in = 1  # previous global_shaping
            n_out = A * agent_w + shared_w + 5
            # rows-carried rollout: next step's scratch = this step's
            # emitted shaping row (unpack is state-free)
            carry_extra_idx = (A * agent_w + shared_w + 4,)

            @staticmethod
            def scratch_rows(state):
                return state.scenario["global_shaping"][None]  # [1, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot, w = ctx["rot"], ctx["w"]
                prev = ctx["scratch"][0]

                fx, fy = px[floor_i], py[floor_i]
                fcos, fsin = jnp.cos(rot[floor_i]), jnp.sin(rot[floor_i])
                # line-floor overlap: box-line distance < 0 (queries.py:60-68)
                bx_, by_, lx_, ly_ = (
                    *F._closest_line_box(
                        fx, fy, fcos, fsin, floor_hw, floor_hl,
                        px[line_i], py[line_i],
                        jnp.cos(rot[line_i]), jnp.sin(rot[line_i]), line_half,
                    ),
                )
                line_floor = F._norm(bx_ - lx_, by_ - ly_) - LINE_MIN_DIST < 0
                # package-floor overlap: box-sphere branch (queries.py:82-93)
                cx, cy = F._closest_point_box(
                    fx, fy, fcos, fsin, floor_hw, floor_hl, px[pkg_i], py[pkg_i]
                )
                d_sphere_closest = F._norm(px[pkg_i] - cx, py[pkg_i] - cy)
                d_sphere_box = F._norm(px[pkg_i] - fx, py[pkg_i] - fy)
                d_closest_box = F._norm(fx - cx, fy - cy)
                pkg_floor = (d_sphere_box < d_closest_box) | (
                    d_sphere_closest < pkg_r + LINE_MIN_DIST
                )
                on_ground = line_floor | pkg_floor

                dgx, dgy = px[pkg_i] - px[goal_i], py[pkg_i] - py[goal_i]
                package_dist = F._norm(dgx, dgy)
                shaping = package_dist * factor
                pos_rew = prev - shaping
                ground_rew = jnp.where(on_ground, fall_rew, 0.0)
                # package-goal overlap: sphere-sphere distance < 0
                pkg_goal = package_dist - pkg_r - goal_r < 0
                done = on_ground | pkg_goal

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        px[ai] - px[pkg_i], py[ai] - py[pkg_i],
                        px[ai] - px[line_i], py[ai] - py[line_i],
                    ]
                rows += [
                    dgx, dgy, vx[pkg_i], vy[pkg_i],
                    vx[line_i], vy[line_i], w[line_i],
                    jnp.mod(rot[line_i], jnp.pi),
                ]
                rows += [
                    pos_rew, ground_rew,
                    on_ground.astype(jnp.float32), done.astype(jnp.float32),
                    shaping,
                ]
                return rows

            @staticmethod
            def unpack(extra, state):
                shared = extra[A * agent_w : A * agent_w + shared_w].T
                obs = tuple(
                    jnp.concatenate(
                        [extra[i * agent_w : (i + 1) * agent_w].T, shared], -1
                    )
                    for i in range(A)
                )
                base = A * agent_w + shared_w
                pos_rew = extra[base]
                ground_rew = extra[base + 1]
                on_ground = extra[base + 2] > 0.5
                done = extra[base + 3] > 0.5
                shaping = extra[base + 4]
                rew = ground_rew + pos_rew
                rews = tuple(rew for _ in range(A))
                updates = {
                    "on_the_ground": on_ground,
                    "global_shaping": shaping,
                    "pos_rew": pos_rew,
                    "ground_rew": ground_rew,
                }
                return obs, rews, done, updates

        return BalanceOutputs()


class HeuristicPolicy(BaseHeuristicPolicy):
    """Reference balance.py:269-295."""

    def compute_action(self, observation, u_range):
        batch_dim = observation.shape[0]
        dist_package_goal = observation[:, 8:10]
        y_ge_0 = dist_package_goal[:, Y] >= 0
        if self.continuous_actions:
            action = jnp.clip(
                jnp.stack([jnp.zeros(batch_dim), -dist_package_goal[:, Y]], axis=1),
                -u_range, u_range,
            )
            action = action.at[:, Y].set(jnp.where(y_ge_0, 0.0, action[:, Y]))
        else:
            action = jnp.where(y_ge_0, 0, 4)
        return action
