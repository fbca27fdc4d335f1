"""MPE simple_push.

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_push.py.
Goal landmark index is per-env scratch; agent/landmark colors observed are
computed from the goal index exactly as the reference builds them
(simple_push.py:46-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Landmark, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.mpe.simple import uniform_positions
from vmas_tpu.utils import ScenarioUtils

# landmark i color: [0.1, 0.1, 0.1] with channel i+1 += 0.8
LANDMARK_COLORS = jnp.asarray([[0.1, 0.9, 0.1], [0.1, 0.1, 0.9]], jnp.float32)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim=batch_dim, device=device)
        world.add_agent(Agent(name="adversary_0", collide=True, adversary=True))
        world.add_agent(Agent(name="agent_0", collide=True, adversary=False))
        for i in range(2):
            world.add_landmark(Landmark(name=f"landmark {i}", collide=False))
        return world

    def reset_world_at(self, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        scratch["goal_idx"] = jax.random.randint(k3, (state.batch_dim,), 0, 2)
        return state.replace(scenario=scratch)

    def _goal_pos(self, state):
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        l_pos = state.pos[:, l_idx]
        return jnp.take_along_axis(l_pos, state.scenario["goal_idx"][:, None, None], axis=1)[:, 0]

    def reward(self, agent, state):
        goal = self._goal_pos(state)
        if agent.adversary:
            pos_rew = jnp.min(
                jnp.stack(
                    [safe_norm(a.pos(state) - goal) for a in self.world.agents if not a.adversary],
                    axis=1,
                ),
                axis=-1,
            )
            return pos_rew - safe_norm(goal - agent.pos(state))
        return -safe_norm(agent.pos(state) - goal)

    def observation(self, agent, state):
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        other_pos = [o.pos(state) - agent.pos(state) for o in self.world.agents if o is not agent]
        if not agent.adversary:
            B = state.batch_dim
            goal_idx = state.scenario["goal_idx"]
            # agent color [0.25,0.25,0.25] with channel goal+1 += 0.5
            agent_color = jnp.full((B, 3), 0.25) + 0.5 * jax.nn.one_hot(goal_idx + 1, 3)
            entity_color = [jnp.broadcast_to(LANDMARK_COLORS[i][None], (B, 3)) for i in range(2)]
            return jnp.concatenate(
                [
                    agent.vel(state),
                    self._goal_pos(state) - agent.pos(state),
                    agent_color,
                    *entity_pos,
                    *entity_color,
                    *other_pos,
                ],
                axis=-1,
            )
        return jnp.concatenate([agent.vel(state), *entity_pos, *other_pos], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs). The per-env goal landmark is selected
        in-kernel by a one-hot sum over the goal_idx scratch row; the
        constant color blocks are appended in unpack."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        # kernel rows per agent: vel2, [goal_rel2 for the good agent],
        # entity rels 2L, other rels 2(A-1)
        row_w = [2 + (0 if a.adversary else 2) + 2 * L + 2 * (A - 1)
                 for a in agents]
        offs = [sum(row_w[:i]) for i in range(A)]

        class SimplePushOutputs(F_.FusedOutputs):
            n_scratch_in = 1  # goal_idx
            n_out = sum(row_w) + A
            # rows-carried rollout: goal_idx is chosen at reset and never
            # changes mid-rollout -> carried unchanged (None)
            carry_extra_idx = (None,)

            @staticmethod
            def scratch_rows(state):
                return state.scenario["goal_idx"].astype(jnp.float32)[None]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                gidx = ctx["scratch"][0]
                gx = F_._one_hot_select(gidx, [px[lm.index] for lm in lms])
                gy = F_._one_hot_select(gidx, [py[lm.index] for lm in lms])

                rows, rews = [], []
                for a in agents:
                    ai = a.index
                    rows += [vx[ai], vy[ai]]
                    if not a.adversary:
                        rows += [gx - px[ai], gy - py[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    for b in agents:
                        if b is not a:
                            rows += [px[b.index] - px[ai], py[b.index] - py[ai]]
                for a in agents:
                    ai = a.index
                    if a.adversary:
                        pos_rew = None
                        for b in agents:
                            if b.adversary:
                                continue
                            d = F_._norm(px[b.index] - gx, py[b.index] - gy)
                            pos_rew = d if pos_rew is None else jnp.minimum(pos_rew, d)
                        rews.append(
                            pos_rew - F_._norm(gx - px[ai], gy - py[ai])
                        )
                    else:
                        rews.append(-F_._norm(px[ai] - gx, py[ai] - gy))
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                B = state.batch_dim
                goal_idx = state.scenario["goal_idx"]
                obs = []
                for i, a in enumerate(agents):
                    o = extra[offs[i] : offs[i] + row_w[i]]
                    if a.adversary:
                        obs.append(o.T)
                    else:
                        agent_color = jnp.full((B, 3), 0.25) + 0.5 * jax.nn.one_hot(
                            goal_idx + 1, 3
                        )
                        entity_color = [
                            jnp.broadcast_to(LANDMARK_COLORS[k][None], (B, 3))
                            for k in range(2)
                        ]
                        # hook order: vel, goal_rel, agent_color, entity
                        # rels, entity colors, other rels
                        obs.append(
                            jnp.concatenate(
                                [
                                    o[0:4].T, agent_color,
                                    o[4 : 4 + 2 * L].T, *entity_color,
                                    o[4 + 2 * L :].T,
                                ],
                                -1,
                            )
                        )
                base = sum(row_w)
                rews = tuple(extra[base + i] for i in range(A))
                done = jnp.zeros((B,), bool)
                return tuple(obs), rews, done, {}

        return SimplePushOutputs()
