"""Reverse transport scenario.

Behavioral reference: /root/reference/vmas/scenarios/reverse_transport.py.
Agents spawn INSIDE a hollow box package and push it outward to the goal.
(The reference's duplicated shaping-add at reverse_transport.py:185-189 is a
no-op — global_shaping already equals package_shaping — so a single shaping
term reproduces it.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Box, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.package_width = kwargs.pop("package_width", 0.6)
        self.package_length = kwargs.pop("package_length", 0.6)
        self.package_mass = kwargs.pop("package_mass", 50)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        self.shaping_factor = 100
        world = World(batch_dim, device, contact_margin=6e-3, substeps=5, collision_force=500)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", shape=Sphere(0.03), u_multiplier=0.5))
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=0.09), color=Color.LIGHT_GREEN
        )
        world.add_landmark(self.goal)
        self.package = Landmark(
            name=f"package {n_agents - 1}", collide=True, movable=True,
            mass=self.package_mass,
            shape=Box(length=self.package_length, width=self.package_width, hollow=True),
            color=Color.RED,
        )
        self.package.goal = self.goal
        world.add_landmark(self.package)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        k1, k2, k3 = jax.random.split(key, 3)
        package_pos = jax.random.uniform(k1, (B, 2), minval=-1.0, maxval=1.0)
        state = self.package.set_pos(state, package_pos)
        for i, agent in enumerate(self.world.agents):
            r = agent.shape.radius
            kx = jax.random.fold_in(k2, i)
            rel = jnp.stack(
                [
                    jax.random.uniform(kx, (B,), minval=-self.package_length / 2 + r,
                                       maxval=self.package_length / 2 - r),
                    jax.random.uniform(jax.random.fold_in(kx, 1), (B,),
                                       minval=-self.package_width / 2 + r,
                                       maxval=self.package_width / 2 - r),
                ],
                axis=-1,
            )
            state = agent.set_pos(state, rel + package_pos)
        state = self.goal.set_pos(state, jax.random.uniform(k3, (B, 2), minval=-1.0, maxval=1.0))

        scratch = dict(state.scenario)
        scratch["global_shaping"] = (
            safe_norm(self.package.pos(state) - self.goal.pos(state)) * self.shaping_factor
        )
        scratch["on_goal"] = jnp.zeros((B,), bool)
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        dist = safe_norm(self.package.pos(state) - self.goal.pos(state))
        on_goal = self.world.is_overlapping(state, self.package, self.goal)
        package_shaping = dist * self.shaping_factor
        scratch["rew"] = jnp.where(~on_goal, scratch["global_shaping"] - package_shaping, 0.0)
        scratch["global_shaping"] = package_shaping
        scratch["on_goal"] = on_goal
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.package.vel(state),
                self.package.pos(state) - agent.pos(state),
                self.package.pos(state) - self.goal.pos(state),
            ],
            axis=-1,
        )

    def done(self, state):
        return state.scenario["on_goal"]

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs) — same protocol as transport, single hollow
        package. Mirrors pre_rewards/observation/done above line for line;
        asserted equal by tests/test_fused.py."""
        from vmas_tpu.core import fused as F
        from vmas_tpu.core.utils import LINE_MIN_DIST

        agents = world.policy_agents
        A = len(agents)
        goal_i = self.goal.index
        pkg_i = self.package.index
        pkg_hw = self.package.shape.width / 2
        pkg_hl = self.package.shape.length / 2
        radius = float(self.goal.shape.radius)
        factor = float(self.shaping_factor)
        obs_w = 10

        class ReverseTransportOutputs(F.FusedOutputs):
            n_scratch_in = 1  # previous global_shaping
            n_out = A * obs_w + 3
            # rows-carried rollout: next step's scratch = this step's
            # emitted shaping row (unpack is state-free)
            carry_extra_idx = (A * obs_w + 2,)

            @staticmethod
            def scratch_rows(state):
                return state.scenario["global_shaping"][None]  # [1, B]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot = ctx["rot"]
                prev = ctx["scratch"][0]
                gx, gy = px[goal_i], py[goal_i]

                dx, dy = px[pkg_i] - gx, py[pkg_i] - gy
                dist = F._norm(dx, dy)
                # is_overlapping box-sphere (queries.py:82-93)
                cos, sin = jnp.cos(rot[pkg_i]), jnp.sin(rot[pkg_i])
                cx, cy = F._closest_point_box(
                    px[pkg_i], py[pkg_i], cos, sin, pkg_hw, pkg_hl, gx, gy
                )
                d_sphere_closest = F._norm(gx - cx, gy - cy)
                d_closest_box = F._norm(px[pkg_i] - cx, py[pkg_i] - cy)
                on_goal = (dist < d_closest_box) | (
                    d_sphere_closest < radius + LINE_MIN_DIST
                )
                shaping = dist * factor
                rew = jnp.where(on_goal, 0.0, prev - shaping)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        vx[pkg_i], vy[pkg_i],
                        px[pkg_i] - px[ai], py[pkg_i] - py[ai],
                        dx, dy,
                    ]
                rows += [rew, on_goal.astype(jnp.float32), shaping]
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                base = A * obs_w
                rew = extra[base]
                on_goal = extra[base + 1] > 0.5
                shaping = extra[base + 2]
                rews = tuple(rew for _ in range(A))
                updates = {"on_goal": on_goal, "global_shaping": shaping, "rew": rew}
                return obs, rews, on_goal, updates

        return ReverseTransportOutputs()
