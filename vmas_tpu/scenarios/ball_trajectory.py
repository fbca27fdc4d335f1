"""Ball trajectory scenario (two agents joined to a ball orbit it).

Behavioral reference: /root/reference/vmas/scenarios/ball_trajectory.py.
Note: the reference's reward() updates its shaping baselines on EVERY
per-agent call without an is_first guard (ball_trajectory.py:167-198), so the
first agent receives the shaping delta and subsequent agents receive zeros —
reproduced here explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Joint, Landmark, Sphere, World
from vmas_tpu.core.utils import JOINT_FORCE, X, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 0)
        self.speed_shaping_factor = kwargs.pop("speed_shaping_factor", 1)
        self.dist_shaping_factor = kwargs.pop("dist_shaping_factor", 0)
        self.joints = kwargs.pop("joints", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.n_agents = 2
        self.desired_speed = 1
        self.desired_radius = 0.5
        self.agent_spacing = 0.4
        self.agent_radius = 0.03
        self.ball_radius = 2 * self.agent_radius

        world = World(
            batch_dim, device,
            substeps=15 if self.joints else 5,
            joint_force=900 if self.joints else JOINT_FORCE,
            collision_force=1500 if self.joints else 400,
            drag=0,
        )
        world.add_agent(Agent(name="agent_0", shape=Sphere(self.agent_radius), drag=0.25))
        world.add_agent(Agent(name="agent_1", shape=Sphere(self.agent_radius), drag=0.25))
        self.ball = Landmark(
            name="ball", shape=Sphere(radius=self.ball_radius), collide=True,
            movable=True, linear_friction=0.04,
        )
        world.add_landmark(self.ball)
        if self.joints:
            for i in range(self.n_agents):
                world.add_joint(
                    Joint(
                        world.agents[i], self.ball,
                        anchor_a=(0, 0), anchor_b=(0, 0), dist=self.agent_spacing / 2,
                        rotate_a=True, rotate_b=True, collidable=False, width=0, mass=1,
                    )
                )
        return world

    def _closest_point_circle(self, pos):
        n = safe_norm(pos)[:, None]
        return jnp.where(n == 0, 0.0, pos / jnp.where(n == 0, 1.0, n)) * self.desired_radius

    def _shapings(self, state):
        ball_pos, ball_vel = self.ball.pos(state), self.ball.vel(state)
        pos_shaping = (
            safe_norm(ball_pos - self._closest_point_circle(ball_pos)) ** 0.5
            * self.pos_shaping_factor
        )
        speed_shaping = (
            jnp.abs(self.desired_speed - safe_norm(ball_vel)) * self.speed_shaping_factor
        )
        dist_shaping = (
            jnp.stack(
                [safe_norm(a.pos(state) - ball_pos) for a in self.world.agents], axis=1
            ).sum(1)
            * self.dist_shaping_factor
        )
        return pos_shaping, speed_shaping, dist_shaping

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2 = jax.random.split(key)
        ball_pos = jax.random.uniform(
            k1, (B, 2), minval=-self.desired_radius, maxval=self.desired_radius
        )
        state = self.ball.set_pos(state, ball_pos)
        swap = jax.random.bernoulli(k2, 0.5, (B,))
        sign = jnp.where(swap, 1.0, -1.0)
        for i, agent in enumerate(self.world.agents):
            offset = jnp.zeros((B, 2)).at[:, X].set((self.agent_spacing / 2) * sign * (-1 if i == 0 else 1))
            state = agent.set_pos(state, ball_pos + offset)

        pos_s, speed_s, dist_s = self._shapings(state)
        scratch = dict(state.scenario)
        scratch["pos_shaping"] = pos_s
        scratch["speed_shaping"] = speed_s
        scratch["dist_shaping"] = dist_s
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["speed_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["dist_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        pos_s, speed_s, dist_s = self._shapings(state)
        scratch["pos_rew"] = scratch["pos_shaping"] - pos_s
        scratch["speed_rew"] = scratch["speed_shaping"] - speed_s
        scratch["dist_rew"] = scratch["dist_shaping"] - dist_s
        scratch["pos_shaping"] = pos_s
        scratch["speed_shaping"] = speed_s
        scratch["dist_shaping"] = dist_s
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        s = state.scenario
        delta = s["pos_rew"] + s["speed_rew"] + s["dist_rew"]
        # subsequent agents observe zero deltas (see module docstring)
        return delta if agent.slot == 0 else jnp.zeros_like(delta)

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state), agent.vel(state),
                agent.pos(state) - self.ball.pos(state),
                agent.pos(state),
            ],
            axis=-1,
        )

    def info(self, agent, state):
        s = state.scenario
        return {"pos_rew": s["pos_rew"], "speed_rew": s["speed_rew"], "dist_rew": s["dist_rew"]}

    def extra_render(self, env, ax, env_index: int = 0):
        """Trajectory goal circle (reference ball_trajectory.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_circle(ax, (0.0, 0.0), self.desired_radius, (0, 0, 0))

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs) — a 15-substep joint world, so the physics win
        is large and the shaping deltas ride along for free. Mirrors
        _shapings/reward/observation above (incl. the first-agent-only
        reward delta quirk); asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        ball_i = self.ball.index
        R = float(self.desired_radius)
        pos_f = float(self.pos_shaping_factor)
        speed_f = float(self.speed_shaping_factor)
        dist_f = float(self.dist_shaping_factor)
        v_des = float(self.desired_speed)
        obs_w = 8  # pos2 vel2 ball_rel2 pos2

        class BallTrajectoryOutputs(F_.FusedOutputs):
            n_scratch_in = 3  # pos/speed/dist shaping
            n_out = A * obs_w + 6
            # rows-carried rollout: next scratch = the emitted new shaping
            # rows, in scratch_rows order (pos, speed, dist)
            carry_extra_idx = (A * obs_w + 3, A * obs_w + 4, A * obs_w + 5)

            @staticmethod
            def scratch_rows(state):
                s = state.scenario
                return jnp.stack(
                    [s["pos_shaping"], s["speed_shaping"], s["dist_shaping"]],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                pp, sp, dp = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                bx, by = px[ball_i], py[ball_i]
                n = safe_norm2(bx, by)
                # _closest_point_circle: unit(pos) * R with guarded zero
                den = jnp.where(n == 0, 1.0, n)
                cx = jnp.where(n == 0, 0.0, bx / den) * R
                cy = jnp.where(n == 0, 0.0, by / den) * R
                pos_s = safe_norm2(bx - cx, by - cy) ** 0.5 * pos_f
                speed_s = (
                    jnp.abs(v_des - safe_norm2(vx[ball_i], vy[ball_i])) * speed_f
                )
                dist_s = sum(
                    safe_norm2(px[a.index] - bx, py[a.index] - by)
                    for a in agents
                ) * dist_f

                pos_rew = pp - pos_s
                speed_rew = sp - speed_s
                dist_rew = dp - dist_s

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        px[ai] - bx, py[ai] - by,
                        px[ai], py[ai],
                    ]
                rows += [pos_rew, speed_rew, dist_rew, pos_s, speed_s, dist_s]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                pos_rew, speed_rew, dist_rew = (
                    extra[base], extra[base + 1], extra[base + 2]
                )
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                delta = pos_rew + speed_rew + dist_rew
                rews = tuple(
                    delta if i == 0 else jnp.zeros_like(delta)
                    for i in range(A)
                )
                done = jnp.zeros((state.batch_dim,), bool)
                updates = {
                    "pos_rew": pos_rew, "speed_rew": speed_rew,
                    "dist_rew": dist_rew,
                    "pos_shaping": extra[base + 3],
                    "speed_shaping": extra[base + 4],
                    "dist_shaping": extra[base + 5],
                }
                return obs, rews, done, updates

        return BallTrajectoryOutputs()
