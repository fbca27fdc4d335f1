"""Wheel scenario.

Behavioral reference: /root/reference/vmas/scenarios/wheel.py. Agents spin a
heavy line about a fixed pivot toward a desired angular speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Line, Sphere, World
from vmas_tpu.core.utils import JaxUtils
from vmas_tpu.scenario import BaseHeuristicPolicy, BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.line_length = kwargs.pop("line_length", 2)
        line_mass = kwargs.pop("line_mass", 30)
        self.desired_velocity = kwargs.pop("desired_velocity", 0.05)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim, device)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", u_multiplier=0.6, shape=Sphere(0.03)))
        self.line = Landmark(
            name="line", collide=True, rotatable=True,
            shape=Line(length=self.line_length), mass=line_mass, color=Color.BLACK,
        )
        world.add_landmark(self.line)
        world.add_landmark(
            Landmark(name="center", shape=Sphere(radius=0.02), collide=False, color=Color.BLACK)
        )
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state,
                jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=-1.0, maxval=1.0),
            )
        state = self.line.set_rot(
            state,
            jax.random.uniform(
                jax.random.fold_in(key, 1000), (B,), minval=-jnp.pi / 2, maxval=jnp.pi / 2
            ),
        )
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.abs(jnp.abs(self.line.ang_vel(state)) - self.desired_velocity)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return -state.scenario["rew"]

    def observation(self, agent, state):
        rot = self.line.rot(state)
        line_end_1 = jnp.stack(
            [(self.line_length / 2) * jnp.cos(rot), (self.line_length / 2) * jnp.sin(rot)], axis=-1
        )
        line_end_2 = -line_end_1
        ang_vel_abs = jnp.abs(self.line.ang_vel(state))
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.line.pos(state) - agent.pos(state),
                line_end_1 - agent.pos(state),
                line_end_2 - agent.pos(state),
                jnp.mod(rot, jnp.pi)[:, None],
                ang_vel_abs[:, None],
                jnp.abs(ang_vel_abs - self.desired_velocity)[:, None],
            ],
            axis=-1,
        )


    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit wheel's observations/reward as extra rows of the fused
        physics kernel (fused.FusedOutputs; engaged by
        ``make_env("wheel", fused_physics=True)``). The row math mirrors
        pre_rewards/observation above line for line and is asserted equal
        to the hook pipeline by tests/test_fused.py."""
        from vmas_tpu.core import fused as F

        agents = world.policy_agents
        A = len(agents)
        line_i = self.line.index
        half = self.line_length / 2
        v_des = float(self.desired_velocity)
        obs_w = 13

        class WheelOutputs(F.FusedOutputs):
            n_scratch_in = 0
            n_out = A * obs_w + 1
            carry_extra_idx = ()  # no kernel-read scratch -> rows-rollout eligible

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rot_l = ctx["rot"][line_i]
                w_l = ctx["w"][line_i]
                lx, ly = px[line_i], py[line_i]
                e1x = half * jnp.cos(rot_l)
                e1y = half * jnp.sin(rot_l)
                ang_abs = jnp.abs(w_l)
                rew = jnp.abs(ang_abs - v_des)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        lx - px[ai], ly - py[ai],
                        e1x - px[ai], e1y - py[ai],
                        -e1x - px[ai], -e1y - py[ai],
                        jnp.mod(rot_l, jnp.pi), ang_abs, rew,
                    ]
                rows.append(rew)
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rew = extra[A * obs_w]
                rews = tuple(-rew for _ in range(A))
                terminated = jnp.zeros(rew.shape, bool)
                return obs, rews, terminated, {"rew": rew}

        return WheelOutputs()


class HeuristicPolicy(BaseHeuristicPolicy):
    """Reference wheel.py:113-139."""

    def compute_action(self, observation, u_range):
        assert self.continuous_actions is True, "Heuristic for continuous actions only"
        pos_agent = observation[:, :2]
        pos_end2_agent = observation[:, 8:10]
        pos_end2 = pos_end2_agent + pos_agent
        shifted = JaxUtils.rotate_vector(
            pos_end2, jnp.full((pos_end2.shape[0],), jnp.pi / 4)
        )
        return jnp.clip(shifted - pos_agent, -u_range, u_range)
