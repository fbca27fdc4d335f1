"""Debug: waterfall (joint chains + box obstacles).

Behavioral reference: /root/reference/vmas/scenarios/debug/waterfall.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Joint, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.n_agents = kwargs.pop("n_agents", 5)
        self.with_joints = kwargs.pop("joints", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.agent_dist = 0.1
        self.agent_radius = 0.04

        world = World(batch_dim, device, dt=0.1, drag=0.25, substeps=5, collision_force=500)
        for i in range(self.n_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", shape=Sphere(radius=self.agent_radius),
                      u_multiplier=0.7, rotatable=True)
            )
        if self.with_joints:
            for i in range(self.n_agents - 1):
                world.add_joint(
                    Joint(
                        world.agents[i], world.agents[i + 1],
                        anchor_a=(1, 0), anchor_b=(-1, 0), dist=self.agent_dist,
                        rotate_a=True, rotate_b=True, collidable=True, width=0, mass=1,
                    )
                )
            landmark = Landmark(
                name="joined landmark", collide=True, movable=True, rotatable=True,
                shape=Box(length=self.agent_radius * 2, width=0.3), color=Color.GREEN,
            )
            world.add_landmark(landmark)
            world.add_joint(
                Joint(
                    world.agents[-1], landmark,
                    anchor_a=(1, 0), anchor_b=(-1, 0), dist=self.agent_dist,
                    rotate_a=False, rotate_b=False, collidable=True, width=0, mass=1,
                )
            )
        for i in range(5):
            world.add_landmark(
                Landmark(
                    name=f"landmark {i}", collide=True, movable=True, rotatable=True,
                    shape=Box(length=0.3, width=0.1), color=Color.RED,
                )
            )
        world.add_landmark(
            Landmark(name="floor", collide=True, movable=False, shape=Line(length=2), color=Color.BLACK)
        )
        return world

    def reset_world_at(self, state, key):
        joined = (
            [self.world.landmarks[self.n_agents - 1]] if self.with_joints else []
        )
        for i, agent in enumerate(self.world.agents + joined):
            state = agent.set_pos(
                state,
                jnp.asarray(
                    [-0.2 + (self.agent_dist + 2 * self.agent_radius) * i, 1.0], jnp.float32
                ),
            )
        boxes = self.world.landmarks[(self.n_agents + 1) if self.with_joints else 0 : -1]
        for i, landmark in enumerate(boxes):
            state = landmark.set_pos(
                state, jnp.asarray([0.2 if i % 2 else -0.2, 0.6 - 0.3 * i], jnp.float32)
            )
            state = landmark.set_rot(
                state, jnp.asarray(math.pi / 4 if i % 2 else -math.pi / 4, jnp.float32)
            )
        state = self.world.landmarks[-1].set_pos(state, jnp.asarray([0.0, -1.0], jnp.float32))
        return state

    def reward(self, agent, state):
        return -safe_norm(agent.pos(state) - self.world.landmarks[-1].pos(state))

    def observation(self, agent, state):
        return jnp.concatenate(
            [agent.pos(state), agent.vel(state)]
            + [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks],
            axis=-1,
        )

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs)."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        goal_i = lms[-1].index
        obs_w = 4 + 2 * L

        class WaterfallOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = A * obs_w + A
            carry_extra_idx = ()  # no kernel-read scratch; joints ride the carry

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rows, rews = [], []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    rews.append(
                        -F_._norm(px[ai] - px[goal_i], py[ai] - py[goal_i])
                    )
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rews = tuple(extra[A * obs_w + i] for i in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                return obs, rews, done, {}

        return WaterfallOutputs()
