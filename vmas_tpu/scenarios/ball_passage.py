"""Ball passage scenario (push a ball through a wall opening to a goal).

Behavioral reference: /root/reference/vmas/scenarios/ball_passage.py.
Passage x-slots are permuted per env (reference host randperm,
ball_passage.py:335-340).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import X, Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_passages = kwargs.pop("n_passages", 1)
        self.fixed_passage = kwargs.pop("fixed_passage", False)
        self.random_start_angle = kwargs.pop("random_start_angle", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert 1 <= self.n_passages <= 20

        self.pos_shaping_factor = 1
        self.collision_reward = -0.06
        self.n_agents = 2
        self.agent_spacing = 0.5
        self.agent_radius = 0.03333
        self.ball_radius = self.agent_radius
        self.passage_width = 0.2
        self.passage_length = 0.103
        self.visualize_semidims = False

        world = World(batch_dim, device, x_semidim=1, y_semidim=1, drag=0, linear_friction=0.0)
        for i in range(2):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(self.agent_radius), u_multiplier=0.7, mass=2, drag=0.25)
            )
        self.goal = Landmark(name="goal", shape=Sphere(radius=self.ball_radius), collide=False, color=Color.GREEN)
        world.add_landmark(self.goal)
        self.ball = Landmark(
            name="ball", shape=Sphere(radius=self.ball_radius), collide=True,
            movable=True, mass=1, color=Color.BLACK, linear_friction=0.02,
        )
        world.add_landmark(self.ball)
        self.create_passage_map(world)
        return world

    def create_passage_map(self, world):
        self.passages = []
        n_boxes = int((2 * world.x_semidim + 2 * self.agent_radius) // self.passage_length)

        def removed(i):
            return (n_boxes // 2) - self.n_passages / 2 <= i < (n_boxes // 2) + self.n_passages / 2

        for i in range(n_boxes):
            passage = Landmark(
                name=f"passage {i}", collide=not removed(i), movable=False,
                shape=Box(length=self.passage_length, width=self.passage_width),
                color=Color.RED,
                collision_filter=lambda e: not isinstance(e.shape, Box),
            )
            self.passages.append(passage)
            world.add_landmark(passage)

    def _open_passages(self):
        return [p for p in self.passages if not p.collide]

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lim = jnp.pi / 2
        if self.random_start_angle:
            start_angle = jax.random.uniform(k1, (B,), minval=-lim, maxval=lim)
        else:
            start_angle = jnp.full((B,), -lim)
        dx = (self.agent_spacing / 2) * jnp.cos(start_angle)
        dy = (self.agent_spacing / 2) * jnp.sin(start_angle)
        dxa, dya = jnp.abs(dx), jnp.abs(dy)

        min_x = -1 + (self.agent_radius + dxa)
        max_x = 1 - (self.agent_radius + dxa)
        min_y = -1 + (self.agent_radius + dya)
        max_y = -2 * self.agent_radius - self.passage_width / 2 - dya

        r = jax.random.uniform(k2, (B, 2))
        ball_pos = jnp.stack(
            [(min_x - max_x) * r[:, 0] + max_x, (min_y - max_y) * r[:, 1] + max_y], axis=-1
        )
        state = self.ball.set_pos(state, ball_pos)
        delta = jnp.stack([dx, dy], axis=-1)
        state = self.world.agents[0].set_pos(state, ball_pos - delta)
        state = self.world.agents[1].set_pos(state, ball_pos + delta)

        min_xg, max_xg = -1 + self.agent_radius, 1 - self.agent_radius
        min_yg = 2 * self.agent_radius + self.passage_width / 2
        max_yg = 1 - self.agent_radius
        rg = jax.random.uniform(k3, (B, 2))
        goal_pos = jnp.stack(
            [(min_xg - max_xg) * rg[:, 0] + max_xg, (min_yg - max_yg) * rg[:, 1] + max_yg], axis=-1
        )
        state = self.goal.set_pos(state, goal_pos)

        # passage slots
        n_boxes = len(self.passages)
        slot_x = (
            -1 - self.agent_radius + self.passage_length / 2
            + self.passage_length * jnp.arange(n_boxes, dtype=jnp.float32)
        )
        if self.fixed_passage:
            perm = jnp.broadcast_to(jnp.arange(n_boxes), (B, n_boxes))
        else:
            perm = jax.random.permutation(
                k4, jnp.broadcast_to(jnp.arange(n_boxes), (B, n_boxes)), axis=1, independent=True
            )
        for i, passage in enumerate(self.passages):
            state = passage.set_pos(
                state, jnp.stack([slot_x[perm[:, i]], jnp.zeros((B,))], axis=-1)
            )
            if not passage.collide:
                state = passage.set_rendering(state, False)

        scratch = dict(state.scenario)
        scratch["pos_shaping_pre"] = (
            jnp.min(
                jnp.stack(
                    [safe_norm(ball_pos - p.pos(state)) for p in self._open_passages()], axis=1
                ),
                axis=1,
            )
            * self.pos_shaping_factor
        )
        scratch["pos_shaping_post"] = safe_norm(ball_pos - goal_pos) * self.pos_shaping_factor
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["collision_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        B = state.batch_dim
        ball_pos = self.ball.pos(state)
        ball_passed = ball_pos[:, Y] > 0

        dist_pass = jnp.min(
            jnp.stack([safe_norm(ball_pos - p.pos(state)) for p in self._open_passages()], axis=1),
            axis=1,
        )
        ball_shaping_pre = dist_pass * self.pos_shaping_factor
        pos_rew = jnp.where(~ball_passed, scratch["pos_shaping_pre"] - ball_shaping_pre, 0.0)
        scratch["pos_shaping_pre"] = ball_shaping_pre

        dist_goal = safe_norm(ball_pos - self.goal.pos(state))
        ball_shaping_post = dist_goal * self.pos_shaping_factor
        pos_rew = pos_rew + jnp.where(ball_passed, scratch["pos_shaping_post"] - ball_shaping_post, 0.0)
        scratch["pos_shaping_post"] = ball_shaping_post

        coll = jnp.zeros((B,), jnp.float32)
        for a in self.world.agents:
            for p in self.passages:
                if p.collide:
                    coll = coll + self.collision_reward * self.world.is_overlapping(state, a, p).astype(jnp.float32)
        for p in self.passages:
            if p.collide:
                coll = coll + self.collision_reward * self.world.is_overlapping(state, p, self.ball).astype(jnp.float32)

        scratch["pos_rew"] = pos_rew
        scratch["collision_rew"] = coll
        scratch["rew"] = pos_rew + coll
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        passage_obs = [
            agent.pos(state) - p.pos(state) for p in self._open_passages()
        ]
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                agent.pos(state) - self.goal.pos(state),
                agent.pos(state) - self.ball.pos(state),
                *passage_obs,
            ],
            axis=-1,
        )

    def done(self, state):
        ball_pos = self.ball.pos(state)
        return (
            (safe_norm(ball_pos - self.goal.pos(state)) <= 0.01)
            | (-1 + self.ball_radius >= ball_pos[:, X])
            | (ball_pos[:, X] >= 1 - self.ball_radius)
            | (-1 + self.ball_radius >= ball_pos[:, Y])
            | (ball_pos[:, Y] >= 1 - self.ball_radius)
        )

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "collision_rew": state.scenario["collision_rew"]}

    def extra_render(self, env, ax, env_index: int = 0):
        """Arena perimeter (reference ball_passage.py extra_render)."""
        from vmas_tpu.render import draw

        draw.draw_perimeter(ax, float(self.world.x_semidim), pad=self.agent_radius)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). The ~3*(n_boxes-1) box-sphere overlap
        penalty tests (queries.py:82-93) and the passage/goal shaping with
        the ball-passed gating run in-kernel."""
        from vmas_tpu.core import fused as F_
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A = len(agents)
        ball_i = self.ball.index
        goal_i = self.goal.index
        open_idx = [p.index for p in self._open_passages()]
        walls = [p.index for p in self.passages if p.collide]
        collidables = [(a.index, float(a.shape.radius)) for a in agents]
        collidables.append((ball_i, float(self.ball.shape.radius)))
        hw = self.passage_width / 2
        hl = self.passage_length / 2
        factor = float(self.pos_shaping_factor)
        coll_pen = float(self.collision_reward)
        ball_r = float(self.ball_radius)
        obs_w = 8 + 2 * len(open_idx)  # pos2 vel2 goal_rel2 ball_rel2 + open

        class BallPassageOutputs(F_.FusedOutputs):
            n_scratch_in = 2  # pos_shaping_pre/post
            n_out = A * obs_w + 6
            # rows-carried rollout: next scratch = the emitted new pre/post
            # shaping rows, in scratch_rows order
            carry_extra_idx = (A * obs_w + 3, A * obs_w + 4)

            @staticmethod
            def scratch_rows(state):
                s = state.scenario
                return jnp.stack(
                    [s["pos_shaping_pre"], s["pos_shaping_post"]], axis=0
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                pp_pre, pp_post = ctx["scratch"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                ball_passed = py[ball_i] > 0
                dist_pass = None
                for pi in open_idx:
                    d = safe_norm2(px[ball_i] - px[pi], py[ball_i] - py[pi])
                    dist_pass = d if dist_pass is None else jnp.minimum(dist_pass, d)
                pre = dist_pass * factor
                pos_rew = jnp.where(~ball_passed, pp_pre - pre, 0.0)
                dist_goal = safe_norm2(
                    px[ball_i] - px[goal_i], py[ball_i] - py[goal_i]
                )
                post = dist_goal * factor
                pos_rew = pos_rew + jnp.where(ball_passed, pp_post - post, 0.0)

                # XLA loop order: agents x walls, then ball x walls
                coll = None
                for ci, r in collidables:
                    for wi in walls:
                        cos, sin = jnp.cos(rot[wi]), jnp.sin(rot[wi])
                        cx, cy = F_._closest_point_box(
                            px[wi], py[wi], cos, sin, hw, hl, px[ci], py[ci]
                        )
                        d_sc = safe_norm2(px[ci] - cx, py[ci] - cy)
                        d_sb = safe_norm2(px[ci] - px[wi], py[ci] - py[wi])
                        d_cb = safe_norm2(px[wi] - cx, py[wi] - cy)
                        hit = (
                            (d_sb < d_cb) | (d_sc < r + LINE_MIN_DIST)
                        ).astype(jnp.float32) * coll_pen
                        coll = hit if coll is None else coll + hit

                rew = pos_rew + coll
                done = (
                    (dist_goal <= 0.01)
                    | (-1 + ball_r >= px[ball_i])
                    | (px[ball_i] >= 1 - ball_r)
                    | (-1 + ball_r >= py[ball_i])
                    | (py[ball_i] >= 1 - ball_r)
                )

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        px[ai] - px[goal_i], py[ai] - py[goal_i],
                        px[ai] - px[ball_i], py[ai] - py[ball_i],
                    ]
                    for pi in open_idx:
                        rows += [px[ai] - px[pi], py[ai] - py[pi]]
                rows += [
                    rew, pos_rew, coll, pre, post, done.astype(jnp.float32)
                ]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                rew = extra[base]
                pos_rew = extra[base + 1]
                coll = extra[base + 2]
                pre, post = extra[base + 3], extra[base + 4]
                done = extra[base + 5] > 0.5
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rews = tuple(rew for _ in range(A))
                updates = {
                    "pos_shaping_pre": pre, "pos_shaping_post": post,
                    "pos_rew": pos_rew, "collision_rew": coll, "rew": rew,
                }
                return obs, rews, done, updates

        return BallPassageOutputs()
