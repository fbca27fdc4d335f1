"""Buzz-wire scenario (two agents joined to a ball guide it down a wire maze).

Behavioral reference: /root/reference/vmas/scenarios/buzz_wire.py. The
reference sets the joint landmark poses explicitly at reset
(buzz_wire.py:175-187); World.sync_joints reproduces those poses from the
anchors, so the explicit sets are subsumed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Joint, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.random_start_angle = kwargs.pop("random_start_angle", True)
        self.pos_shaping_factor = kwargs.pop("pos_shaping_factor", 1)
        self.collision_reward = kwargs.pop("collision_reward", -10)
        self.max_speed_1 = kwargs.pop("max_speed_1", None)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.pos_shaping_factor = 1
        self.n_agents = 2
        self.wall_length = 2
        self.agent_spacing = 0.5
        self.agent_radius = 0.03
        self.ball_radius = self.agent_radius

        world = World(batch_dim, device, substeps=15, joint_force=900, collision_force=1500)
        world.add_agent(Agent(name="agent_0", shape=Sphere(self.agent_radius), u_multiplier=1, mass=1))
        world.add_agent(
            Agent(name="agent_1", shape=Sphere(self.agent_radius), u_multiplier=1, mass=1, max_speed=self.max_speed_1)
        )
        self.goal = Landmark(name="goal", shape=Sphere(radius=self.ball_radius), collide=False, color=Color.GREEN)
        world.add_landmark(self.goal)
        self.ball = Landmark(name="ball", shape=Sphere(radius=self.ball_radius), collide=True, movable=True)
        world.add_landmark(self.ball)
        for i in range(2):
            world.add_joint(
                Joint(
                    world.agents[i], self.ball,
                    anchor_a=(0, 0), anchor_b=(0, 0), dist=self.agent_spacing / 2,
                    rotate_a=True, rotate_b=True, collidable=False, width=0, mass=1,
                )
            )
        self.build_path_line(world)
        return world

    def build_path_line(self, world):
        self.walls = []
        for i in range(2):
            w = Landmark(name=f"wall {i}", collide=True, shape=Line(length=self.wall_length), color=Color.BLACK)
            self.walls.append(w)
            world.add_landmark(w)
        self.floors = []
        for i in range(2):
            f = Landmark(name=f"floor {i}", collide=True, shape=Line(length=self.agent_spacing / 2), color=Color.BLACK)
            self.floors.append(f)
            world.add_landmark(f)

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3 = jax.random.split(key, 3)
        lim = jnp.pi / 2 - jnp.pi / 3 if self.random_start_angle else 0.0
        start_angle = jax.random.uniform(k1, (B,), minval=-lim, maxval=lim)
        dx = (self.agent_spacing / 2) * jnp.cos(start_angle)
        dy = (self.agent_spacing / 2) * jnp.sin(start_angle)

        min_x, max_x = -self.agent_radius, self.agent_radius
        min_y = -self.wall_length / 2 + 2 * self.agent_radius
        max_y = -self.agent_radius

        r = jax.random.uniform(k2, (B, 2))
        ball_pos = jnp.stack(
            [(min_x - max_x) * r[:, 0] + max_x, (min_y - max_y) * r[:, 1] + max_y], axis=-1
        )
        rg = jax.random.uniform(k3, (B, 2))
        goal_pos = jnp.stack(
            [(min_x - max_x) * rg[:, 0] + max_x, (-min_y + max_x) * rg[:, 1] - max_x], axis=-1
        )
        state = self.goal.set_pos(state, goal_pos)
        state = self.ball.set_pos(state, ball_pos)
        delta = jnp.stack([dx, dy], axis=-1)
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(state, ball_pos + delta * (-1 if i == 0 else 1))

        for i, wall in enumerate(self.walls):
            state = wall.set_pos(
                state, jnp.asarray([(self.agent_spacing / 4) * (-1 if i == 0 else 1), 0.0], jnp.float32)
            )
            state = wall.set_rot(state, jnp.asarray(jnp.pi / 2, jnp.float32))
        for i, floor in enumerate(self.floors):
            state = floor.set_pos(
                state, jnp.asarray([0.0, (self.wall_length / 2) * (-1 if i == 0 else 1)], jnp.float32)
            )

        scratch = dict(state.scenario)
        scratch["pos_shaping"] = safe_norm(ball_pos - goal_pos) * self.pos_shaping_factor
        scratch["collided"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["collision_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        B = state.batch_dim
        dist = safe_norm(self.ball.pos(state) - self.goal.pos(state))
        pos_shaping = dist * self.pos_shaping_factor
        pos_rew = scratch["pos_shaping"] - pos_shaping
        scratch["pos_shaping"] = pos_shaping

        coll_rew = jnp.zeros((B,), jnp.float32)
        collided = jnp.zeros((B,), bool)
        for collidable in self.world.agents + [self.ball]:
            for entity in self.walls + self.floors:
                is_overlap = self.world.is_overlapping(state, collidable, entity)
                coll_rew = coll_rew + self.collision_reward * is_overlap.astype(jnp.float32)
                collided = collided | is_overlap
        scratch["pos_rew"] = pos_rew
        scratch["collision_rew"] = coll_rew
        scratch["collided"] = collided
        scratch["rew"] = pos_rew + coll_rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        return jnp.concatenate(
            [agent.pos(state), agent.vel(state), agent.pos(state) - self.goal.pos(state)],
            axis=-1,
        )

    def done(self, state):
        return (
            safe_norm(self.ball.pos(state) - self.goal.pos(state)) <= 0.01
        ) | state.scenario["collided"]

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "collision_rew": state.scenario["collision_rew"]}

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). The 12 sphere-line overlap tests (line
        closest-point form, queries.py:31-34,52-54) run in-kernel on the
        VMEM-resident state. Asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F_
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A = len(agents)
        ball_i = self.ball.index
        goal_i = self.goal.index
        collidables = [(a.index, float(a.shape.radius)) for a in agents]
        collidables.append((ball_i, float(self.ball.shape.radius)))
        lines = [
            (e.index, e.shape.length / 2) for e in self.walls + self.floors
        ]
        factor = float(self.pos_shaping_factor)
        coll_pen = float(self.collision_reward)
        obs_w = 6  # pos2 vel2 goal_rel2

        class BuzzWireOutputs(F_.FusedOutputs):
            n_scratch_in = 1  # previous pos_shaping
            n_out = A * obs_w + 6
            # rows-carried rollout: next scratch = the emitted new shaping
            carry_extra_idx = (A * obs_w + 3,)

            @staticmethod
            def scratch_rows(state):
                return state.scenario["pos_shaping"][None]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                prev = ctx["scratch"][0]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                dist = safe_norm2(
                    px[ball_i] - px[goal_i], py[ball_i] - py[goal_i]
                )
                shaping = dist * factor
                pos_rew = prev - shaping

                coll_rew, collided = None, None
                for ci, r in collidables:
                    for li, half in lines:
                        cx, cy = F_._closest_point_line(
                            px[li], py[li],
                            jnp.cos(rot[li]), jnp.sin(rot[li]), half,
                            px[ci], py[ci],
                        )
                        # line-sphere get_distance (queries.py:31-34,52-54)
                        over = (
                            safe_norm2(px[ci] - cx, py[ci] - cy)
                            - LINE_MIN_DIST - r
                            < 0
                        )
                        hit = over.astype(jnp.float32) * coll_pen
                        coll_rew = hit if coll_rew is None else coll_rew + hit
                        collided = over if collided is None else (collided | over)

                rew = pos_rew + coll_rew
                done = (dist <= 0.01) | collided

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        px[ai] - px[goal_i], py[ai] - py[goal_i],
                    ]
                rows += [
                    rew, pos_rew, coll_rew, shaping,
                    collided.astype(jnp.float32), done.astype(jnp.float32),
                ]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * obs_w
                rew = extra[base]
                pos_rew = extra[base + 1]
                coll_rew = extra[base + 2]
                shaping = extra[base + 3]
                collided = extra[base + 4] > 0.5
                done = extra[base + 5] > 0.5
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rews = tuple(rew for _ in range(A))
                updates = {
                    "pos_shaping": shaping, "pos_rew": pos_rew,
                    "collision_rew": coll_rew, "collided": collided,
                    "rew": rew,
                }
                return obs, rews, done, updates

        return BuzzWireOutputs()
