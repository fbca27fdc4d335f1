"""MPE simple_adversary.

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_adversary.py.
The reference picks ONE goal landmark for all envs at full reset via host
randint (simple_adversary.py:53-59); functionally the goal index is [B] scratch
drawn per reset (per-env goals — the original MPE semantics), blended like all
other state on partial resets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.mpe.simple import uniform_positions
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        n_agents = kwargs.pop("n_agents", 3)
        n_adversaries = kwargs.pop("n_adversaries", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert n_agents > n_adversaries

        world = World(batch_dim=batch_dim, device=device)
        for i in range(n_agents):
            adversary = i < n_adversaries
            name = f"adversary_{i}" if adversary else f"agent_{i - n_adversaries}"
            world.add_agent(
                Agent(
                    name=name, collide=False, shape=Sphere(radius=0.15),
                    color=Color.RED if adversary else Color.BLUE, adversary=adversary,
                )
            )
        for i in range(n_agents - 1):
            world.add_landmark(
                Landmark(name=f"landmark {i}", collide=False, shape=Sphere(radius=0.08), color=Color.BLACK)
            )
        return world

    def reset_world_at(self, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        scratch["goal_idx"] = jax.random.randint(
            k3, (state.batch_dim,), 0, len(self.world.landmarks)
        )
        return state.replace(scenario=scratch)

    def _goal_pos(self, state):
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        l_pos = state.pos[:, l_idx]  # [B, L, 2]
        return jnp.take_along_axis(
            l_pos, state.scenario["goal_idx"][:, None, None], axis=1
        )[:, 0]

    def good_agents(self):
        return [a for a in self.world.agents if not a.adversary]

    def adversaries(self):
        return [a for a in self.world.agents if a.adversary]

    def reward(self, agent, state):
        return self.adversary_reward(agent, state) if agent.adversary else self.agent_reward(agent, state)

    def agent_reward(self, agent, state):
        goal = self._goal_pos(state)
        adv_rew = sum(safe_norm(a.pos(state) - goal) for a in self.adversaries())
        pos_rew = -jnp.min(
            jnp.stack([safe_norm(a.pos(state) - goal) for a in self.good_agents()], axis=1),
            axis=-1,
        )
        return pos_rew + adv_rew

    def adversary_reward(self, agent, state):
        return -safe_norm(agent.pos(state) - self._goal_pos(state))

    def observation(self, agent, state):
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        other_pos = [o.pos(state) - agent.pos(state) for o in self.world.agents if o is not agent]
        if not agent.adversary:
            return jnp.concatenate(
                [self._goal_pos(state) - agent.pos(state), *entity_pos, *other_pos], axis=-1
            )
        return jnp.concatenate([*entity_pos, *other_pos], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs); the per-env goal landmark is a one-hot sum
        over the goal_idx scratch row."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        goods = [a for a in agents if not a.adversary]
        advs = [a for a in agents if a.adversary]
        row_w = [(0 if a.adversary else 2) + 2 * L + 2 * (A - 1)
                 for a in agents]
        offs = [sum(row_w[:i]) for i in range(A)]

        class SimpleAdversaryOutputs(F_.FusedOutputs):
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
                gidx = ctx["scratch"][0]
                gx = F_._one_hot_select(gidx, [px[lm.index] for lm in lms])
                gy = F_._one_hot_select(gidx, [py[lm.index] for lm in lms])

                rows = []
                for a in agents:
                    ai = a.index
                    if not a.adversary:
                        rows += [gx - px[ai], gy - py[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    for b in agents:
                        if b is not a:
                            rows += [px[b.index] - px[ai], py[b.index] - py[ai]]

                adv_sum = sum(
                    F_._norm(px[a.index] - gx, py[a.index] - gy) for a in advs
                )
                good_min = None
                for a in goods:
                    d = F_._norm(px[a.index] - gx, py[a.index] - gy)
                    good_min = d if good_min is None else jnp.minimum(good_min, d)
                rews = []
                for a in agents:
                    if a.adversary:
                        rews.append(
                            -F_._norm(px[a.index] - gx, py[a.index] - gy)
                        )
                    else:
                        rews.append(-good_min + adv_sum)
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[offs[i] : offs[i] + row_w[i]].T for i in range(A)
                )
                base = sum(row_w)
                rews = tuple(extra[base + i] for i in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                return obs, rews, done, {}

        return SimpleAdversaryOutputs()
