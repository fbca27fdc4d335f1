"""MPE simple_speaker_listener (dim_c=3; immovable speaker, silent listener).

Behavioral reference:
/root/reference/vmas/scenarios/mpe/simple_speaker_listener.py. Goal landmark
index is per-env scratch; the observed goal color is the landmark's static
color gathered by that index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Landmark, Sphere, World
from vmas_tpu.core.utils import safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.scenarios.mpe.simple import uniform_positions
from vmas_tpu.utils import ScenarioUtils

LANDMARK_COLORS = jnp.asarray(
    [[0.65, 0.15, 0.15], [0.15, 0.65, 0.15], [0.15, 0.15, 0.65]], jnp.float32
)


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        ScenarioUtils.check_kwargs_consumed(kwargs)
        world = World(batch_dim=batch_dim, device=device, dim_c=3)
        world.add_agent(
            Agent(name="speaker_0", collide=False, movable=False, silent=False, shape=Sphere(radius=0.075))
        )
        world.add_agent(
            Agent(name="listener_0", collide=False, movable=True, silent=True, shape=Sphere(radius=0.075))
        )
        for i in range(3):
            world.add_landmark(Landmark(name=f"landmark {i}", collide=False, shape=Sphere(radius=0.04)))
        return world

    def reset_world_at(self, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        scratch["goal_idx"] = jax.random.randint(k3, (state.batch_dim,), 0, 3)
        return state.replace(scenario=scratch)

    def _goal_pos(self, state):
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        l_pos = state.pos[:, l_idx]
        return jnp.take_along_axis(l_pos, state.scenario["goal_idx"][:, None, None], axis=1)[:, 0]

    def reward(self, agent, state):
        # -dist(listener, goal), counted once per agent (reference
        # simple_speaker_listener.py:118-131 sums the same term per agent).
        listener = self.world.agents[1]
        d = safe_norm(listener.pos(state) - self._goal_pos(state))
        return -d * len(self.world.agents)

    def observation(self, agent, state):
        goal_color = LANDMARK_COLORS[state.scenario["goal_idx"]]  # [B, 3]
        if not agent.movable:  # speaker
            return goal_color
        # listener
        entity_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        comm = [o.comm(state) for o in self.world.agents if o is not agent]
        return jnp.concatenate([agent.vel(state), *entity_pos, *comm], axis=-1)

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit the listener's positional obs rows and the shared reward
        from the fused physics kernel (fused.FusedOutputs); the speaker's
        goal-color obs and the comm vector are assembled in unpack."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        listener = agents[1]
        row_w = 2 + 2 * L  # listener vel + entity rels

        class SpeakerListenerOutputs(F_.FusedOutputs):
            n_scratch_in = 1  # goal_idx
            # rows-carried rollout: goal_idx is reset-constant (None);
            # unpack's comm read rides the hoisted per-step uc
            carry_extra_idx = (None,)
            unpack_reads = ("c",)
            n_out = row_w + 1

            @staticmethod
            def scratch_rows(state):
                return state.scenario["goal_idx"].astype(jnp.float32)[None]

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                gidx = ctx["scratch"][0]
                li = listener.index
                gx = F_._one_hot_select(gidx, [px[lm.index] for lm in lms])
                gy = F_._one_hot_select(gidx, [py[lm.index] for lm in lms])
                rows = [vx[li], vy[li]]
                for lm in lms:
                    rows += [px[lm.index] - px[li], py[lm.index] - py[li]]
                rows.append(
                    -F_._norm(px[li] - gx, py[li] - gy) * float(A)
                )
                return rows

            @staticmethod
            def unpack(extra, state):
                goal_color = LANDMARK_COLORS[state.scenario["goal_idx"]]
                comm = [
                    b.comm(state) for b in agents if b is not listener
                ]
                obs = (
                    goal_color,  # speaker
                    jnp.concatenate([extra[:row_w].T, *comm], -1),  # listener
                )
                rew = extra[row_w]
                rews = tuple(rew for _ in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                return obs, rews, done, {}

        return SpeakerListenerOutputs()
