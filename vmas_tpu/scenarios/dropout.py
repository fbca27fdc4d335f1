"""Dropout scenario.

Behavioral reference: /root/reference/vmas/scenarios/dropout.py. Any agent
reaching the shared goal earns the team reward once; actions carry an energy
penalty, so the team should "drop out" redundant movers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils

DEFAULT_ENERGY_COEFF = 0.02


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 4)
        self.energy_coeff = kwargs.pop("energy_coeff", DEFAULT_ENERGY_COEFF)
        self.start_same_point = kwargs.pop("start_same_point", False)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.agent_radius = 0.05
        self.goal_radius = 0.03

        world = World(batch_dim, device)
        for i in range(n_agents):
            world.add_agent(Agent(name=f"agent_{i}", collide=False, shape=Sphere(radius=self.agent_radius)))
        self.goal = Landmark(
            name="goal", collide=False, shape=Sphere(radius=self.goal_radius), color=Color.GREEN
        )
        world.add_landmark(self.goal)
        return world

    def reset_world_at(self, state, key):
        B = state.batch_dim
        if self.start_same_point:
            for agent in self.world.agents:
                state = agent.set_pos(state, jnp.zeros((B, 2), jnp.float32))
            state = ScenarioUtils.spawn_entities_randomly(
                self.world.landmarks, self.world, state, key,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1), y_bounds=(-1, 1),
                occupied_positions=jnp.zeros((B, 1, 2), jnp.float32),
            )
        else:
            state = ScenarioUtils.spawn_entities_randomly(
                self.world.policy_agents + self.world.landmarks, self.world, state, key,
                self.goal_radius + self.agent_radius + 0.01,
                x_bounds=(-1, 1), y_bounds=(-1, 1),
            )
        state = self.goal.set_rendering(state, True)
        scratch = dict(state.scenario)
        scratch["eaten"] = jnp.zeros((B,), bool)
        scratch["done"] = jnp.zeros((B,), bool)
        scratch["any_eaten"] = jnp.zeros((B,), bool)
        scratch["pos_rew"] = jnp.zeros((B,), jnp.float32)
        scratch["energy_rew"] = jnp.zeros((B,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        any_eaten = jnp.any(
            jnp.stack(
                [
                    safe_norm(a.pos(state) - self.goal.pos(state))
                    < a.shape.radius + self.goal.shape.radius
                    for a in self.world.agents
                ],
                axis=1,
            ),
            axis=-1,
        )
        scratch["any_eaten"] = any_eaten
        scratch["done"] = any_eaten
        scratch["pos_rew"] = jnp.where(any_eaten & ~scratch["eaten"], 1.0, 0.0)
        scratch["energy_rew"] = self.energy_coeff * -jnp.stack(
            [
                safe_norm(a.u(state))
                / math.sqrt(
                    self.world.dim_p
                    * float((a.u_range_array[0] * a.u_multiplier_array[0]) ** 2)
                )
                for a in self.world.agents
            ],
            axis=1,
        ).sum(-1)
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["pos_rew"] + state.scenario["energy_rew"]

    def post_rewards(self, state):
        scratch = dict(state.scenario)
        eaten = scratch["eaten"] | scratch["any_eaten"]
        scratch["eaten"] = eaten
        rendering = state.rendering.at[:, self.goal.index].set(~eaten)
        return state.replace(scenario=scratch, rendering=rendering)

    def observation(self, agent, state):
        return jnp.concatenate(
            [
                agent.pos(state),
                agent.vel(state),
                self.goal.pos(state) - agent.pos(state),
                state.scenario["eaten"].astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )

    def info(self, agent, state):
        return {"pos_rew": state.scenario["pos_rew"], "energy_rew": state.scenario["energy_rew"]}

    def done(self, state):
        return state.scenario["done"]

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward/done as extra rows of the fused physics kernel
        (fused.FusedOutputs). The energy term is computed in unpack from
        state.u (untouched by physics); the goal-eaten test runs in-kernel.
        Mirrors pre_rewards/observation/done above; asserted equal by
        tests/test_fused.py. post_rewards (the goal-rendering toggle) still
        runs on the unpacked state and is idempotent on "eaten"."""
        from vmas_tpu.core import fused as F

        agents = world.policy_agents
        A = len(agents)
        goal_i = self.goal.index
        eat_r = [
            float(a.shape.radius) + float(self.goal.shape.radius) for a in agents
        ]
        denom = [
            math.sqrt(
                world.dim_p
                * float((a.u_range_array[0] * a.u_multiplier_array[0]) ** 2)
            )
            for a in agents
        ]
        coeff = float(self.energy_coeff)
        agent_w = 6  # pos(2) vel(2) goal-pos(2); eaten row is shared

        class DropoutOutputs(F.FusedOutputs):
            n_scratch_in = 1  # previous eaten
            n_out = A * agent_w + 3
            # rows-carried rollout: next step's prev-eaten is this step's
            # emitted eaten_new row; unpack's only step-varying state read
            # is u (the energy reward), which the rows path substitutes.
            # post_rewards only recomputes eaten (idempotent with the
            # emitted row) and toggles goal rendering — unobservable inside
            # a compiled rollout, so applying it once to the final state
            # (what the flag opts into) is exact.
            carry_extra_idx = (A * agent_w,)
            unpack_reads = ("u",)
            post_rewards_rollout_safe = True

            @staticmethod
            def scratch_rows(state):
                return state.scenario["eaten"].astype(jnp.float32)[None]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                eaten_prev = ctx["scratch"][0] > 0.5
                gx, gy = px[goal_i], py[goal_i]

                rows, any_eaten = [], None
                for a, r in zip(agents, eat_r):
                    ai = a.index
                    hit = F._norm(px[ai] - gx, py[ai] - gy) < r
                    any_eaten = hit if any_eaten is None else (any_eaten | hit)
                    rows += [
                        px[ai], py[ai], vx[ai], vy[ai],
                        gx - px[ai], gy - py[ai],
                    ]
                pos_rew = jnp.where(any_eaten & ~eaten_prev, 1.0, 0.0)
                eaten_new = eaten_prev | any_eaten
                # the obs "eaten" flag reads the POST-post_rewards value
                # (non-fused hook order: post_rewards before observation)
                rows += [
                    eaten_new.astype(jnp.float32),
                    any_eaten.astype(jnp.float32),
                    pos_rew,
                ]
                return rows

            @staticmethod
            def unpack(extra, state):
                base = A * agent_w
                eaten_new = extra[base] > 0.5
                any_eaten = extra[base + 1] > 0.5
                pos_rew = extra[base + 2]
                obs = tuple(
                    jnp.concatenate(
                        [extra[i * agent_w : (i + 1) * agent_w].T,
                         extra[base : base + 1].T],
                        -1,
                    )
                    for i in range(A)
                )
                energy_rew = coeff * -jnp.stack(
                    [safe_norm(a.u(state)) / d for a, d in zip(agents, denom)],
                    axis=1,
                ).sum(-1)
                rew = pos_rew + energy_rew
                rews = tuple(rew for _ in range(A))
                updates = {
                    # post_rewards recomputes eaten|any_eaten (idempotent)
                    "eaten": eaten_new,
                    "any_eaten": any_eaten,
                    "done": any_eaten,
                    "pos_rew": pos_rew,
                    "energy_rew": energy_rew,
                }
                return obs, rews, any_eaten, updates

        return DropoutOutputs()
