"""MPE simple_reference (dim_c=10 communication).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_reference.py.
Per-env goal landmark indices live in scratch (drawn per reset) instead of a
host randint shared across envs; goal "color" observed is the landmark's
static color gathered by that index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Landmark, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.mpe.simple import uniform_positions
from vmas_tpu.utils import ScenarioUtils

LANDMARK_COLORS = jnp.asarray(
    [[0.75, 0.25, 0.25], [0.25, 0.75, 0.25], [0.25, 0.25, 0.75]], jnp.float32
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim=batch_dim, device=device, dim_c=10)
        for i in range(2):
            world.add_agent(Agent(name=f"agent_{i}", collide=False, silent=False))
        for i in range(3):
            world.add_landmark(Landmark(name=f"landmark {i}", collide=False))
        return world

    def reset_world_at(self, state, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        # agent i wants the OTHER agent at landmark goal_b[i]
        scratch["goal_b_0"] = jax.random.randint(k3, (state.batch_dim,), 0, 3)
        scratch["goal_b_1"] = jax.random.randint(k4, (state.batch_dim,), 0, 3)
        return state.replace(scenario=scratch)

    def _goal_b_pos(self, state, i):
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        l_pos = state.pos[:, l_idx]
        idx = state.scenario[f"goal_b_{i}"]
        return jnp.take_along_axis(l_pos, idx[:, None, None], axis=1)[:, 0]

    def reward(self, agent, state):
        # sum over agents of -dist(goal_a, goal_b); goal_a of agent i is the
        # other agent (reference simple_reference.py:110-127)
        rew = jnp.zeros((state.batch_dim,), jnp.float32)
        for i, a in enumerate(self.world.agents):
            goal_a = self.world.agents[1 - i]
            rew = rew - safe_norm(goal_a.pos(state) - self._goal_b_pos(state, i))
        return rew

    def observation(self, agent, state):
        i = agent.slot
        goal_color = LANDMARK_COLORS[state.scenario[f"goal_b_{i}"]]  # [B, 3]
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        comm = [o.comm(state) for o in self.world.agents if o is not agent]
        return jnp.concatenate([agent.vel(state), *entity_pos, goal_color, *comm], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit the positional obs rows and the shared reward from the
        fused physics kernel (fused.FusedOutputs); the goal color and the
        other agent's comm vector (set at action decode, untouched by
        physics) are appended in unpack."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        row_w = 2 + 2 * L

        class SimpleReferenceOutputs(F_.FusedOutputs):
            n_scratch_in = A  # goal_b_i per agent
            # rows-carried rollout: goal indices are reset-constant (None);
            # unpack's comm read rides the hoisted per-step uc
            carry_extra_idx = (None,) * A
            unpack_reads = ("c",)
            n_out = A * row_w + 1

            @staticmethod
            def scratch_rows(state):
                return jnp.stack(
                    [
                        state.scenario[f"goal_b_{i}"].astype(jnp.float32)
                        for i in range(A)
                    ],
                    axis=0,
                )

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                gidx = ctx["scratch"]

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [vx[ai], vy[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                rew = None
                for i, a in enumerate(agents):
                    goal_a = agents[1 - i]
                    gx = F_._one_hot_select(
                        gidx[i], [px[lm.index] for lm in lms]
                    )
                    gy = F_._one_hot_select(
                        gidx[i], [py[lm.index] for lm in lms]
                    )
                    d = -F_._norm(px[goal_a.index] - gx, py[goal_a.index] - gy)
                    rew = d if rew is None else rew + d
                rows.append(rew)
                return rows

            @staticmethod
            def unpack(extra, state):
                rew = extra[A * row_w]
                obs = []
                for i, a in enumerate(agents):
                    o = extra[i * row_w : (i + 1) * row_w].T
                    goal_color = LANDMARK_COLORS[state.scenario[f"goal_b_{i}"]]
                    comm = [
                        b.comm(state) for b in agents if b is not a
                    ]
                    obs.append(jnp.concatenate([o, goal_color, *comm], -1))
                rews = tuple(rew for _ in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                return tuple(obs), rews, done, {}

        return SimpleReferenceOutputs()
