"""MPE simple. Behavioral reference: /root/reference/vmas/scenarios/mpe/simple.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, Landmark, World
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


def uniform_positions(key, B, entities, state, lo=-1.0, hi=1.0):
    """Scatter entities uniformly (the ubiquitous MPE reset pattern)."""
    for i, e in enumerate(entities):
        pos = jax.random.uniform(jax.random.fold_in(key, i), (B, 2), minval=lo, maxval=hi)
        state = e.set_pos(state, pos)
    return state


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim, device)
        world.add_agent(Agent(name="agent_0", collide=False, color=Color.GRAY))
        world.add_landmark(Landmark(name="landmark 0", collide=False, color=Color.RED))
        return world

    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        return uniform_positions(k2, state.batch_dim, self.world.landmarks, state)

    def reward(self, agent, state):
        delta = agent.pos(state) - self.world.landmarks[0].pos(state)
        return -jnp.sum(jnp.square(delta), axis=-1)

    def observation(self, agent, state):
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        return jnp.concatenate([agent.vel(state), *entity_pos], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs)."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        obs_w = 2 + 2 * L

        class SimpleOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = A * obs_w + A
            carry_extra_idx = ()  # no kernel-read scratch -> rows-rollout eligible

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                rows, rews = [], []
                for a in agents:
                    ai = a.index
                    rows += [vx[ai], vy[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    dx = px[ai] - px[lms[0].index]
                    dy = py[ai] - py[lms[0].index]
                    rews.append(-(dx * dx + dy * dy))
                return rows + rews

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rews = tuple(extra[A * obs_w + i] for i in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                return obs, rews, done, {}

        return SimpleOutputs()
