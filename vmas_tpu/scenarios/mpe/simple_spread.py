"""MPE simple_spread (the reference's MPE-comparison benchmark scenario).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_spread.py.
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
        num_agents = kwargs.pop("n_agents", 3)
        self.obs_agents = kwargs.pop("obs_agents", True)
        ScenarioUtils.check_kwargs_consumed(kwargs)

        world = World(batch_dim=batch_dim, device=device)
        for i in range(num_agents):
            world.add_agent(
                Agent(name=f"agent_{i}", collide=True, shape=Sphere(radius=0.15), color=Color.BLUE)
            )
        for i in range(num_agents):
            world.add_landmark(Landmark(name=f"landmark {i}", collide=False, color=Color.BLACK))
        return world

    def reset_world_at(self, state, key):
        k1, k2 = jax.random.split(key)
        state = uniform_positions(k1, state.batch_dim, self.world.agents, state)
        state = uniform_positions(k2, state.batch_dim, self.world.landmarks, state)
        scratch = dict(state.scenario)
        scratch["rew"] = jnp.zeros((state.batch_dim,), jnp.float32)
        return state.replace(scenario=scratch)

    def pre_rewards(self, state):
        agents = self.world.agents
        a_idx = jnp.asarray([a.index for a in agents])
        l_idx = jnp.asarray([lm.index for lm in self.world.landmarks])
        a_pos = state.pos[:, a_idx]  # [B, A, 2]
        l_pos = state.pos[:, l_idx]  # [B, L, 2]
        # min over agents of dist to each landmark, summed over landmarks and
        # repeated per agent (reference simple_spread.py:88-102)
        dist = safe_norm(a_pos[:, :, None, :] - l_pos[:, None, :, :])  # [B, A, L]
        closest = jnp.min(dist, axis=1)  # [B, L]
        rew = -jnp.sum(closest, axis=-1) * len(agents)
        # collision penalty: -1 per overlapping ordered agent pair per agent
        for single_agent in agents:
            if single_agent.collide:
                for a in agents:
                    if a is not single_agent:
                        rew = rew - self.world.is_overlapping(state, a, single_agent).astype(
                            jnp.float32
                        )
        scratch = dict(state.scenario)
        scratch["rew"] = rew
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["rew"]

    def observation(self, agent, state):
        landmark_pos = [lm.pos(state) - agent.pos(state) for lm in self.world.landmarks]
        other_pos = [
            other.pos(state) - agent.pos(state) for other in self.world.agents if other is not agent
        ]
        return jnp.concatenate(
            [agent.pos(state), agent.vel(state), *landmark_pos, *(other_pos if self.obs_agents else [])],
            axis=-1,
        )

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs) — this is the reference's MPE-comparison
        benchmark scenario, so the whole step collapses into one kernel.
        Mirrors pre_rewards/observation above; asserted equal by
        tests/test_fused.py."""
        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        lms = world.landmarks
        A, L = len(agents), len(lms)
        radii = [float(a.shape.radius) for a in agents]
        obs_others = bool(self.obs_agents)
        obs_w = 4 + 2 * L + (2 * (A - 1) if obs_others else 0)

        class SimpleSpreadOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = A * obs_w + 1
            carry_extra_idx = ()  # no kernel-read scratch -> rows-rollout eligible

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]

                safe_norm2 = F_._norm  # the kernel-row zero-guarded L2 norm

                closest_sum = None
                for lm in lms:
                    closest = None
                    for a in agents:
                        d = safe_norm2(
                            px[a.index] - px[lm.index],
                            py[a.index] - py[lm.index],
                        )
                        closest = d if closest is None else jnp.minimum(closest, d)
                    closest_sum = (
                        closest if closest_sum is None else closest_sum + closest
                    )
                rew = -closest_sum * float(A)
                for i in range(A):
                    for j in range(A):
                        if i == j:
                            continue
                        over = (
                            safe_norm2(
                                px[agents[i].index] - px[agents[j].index],
                                py[agents[i].index] - py[agents[j].index],
                            )
                            - radii[i] - radii[j]
                            < 0
                        )
                        rew = rew - over.astype(jnp.float32)

                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    for lm in lms:
                        rows += [px[lm.index] - px[ai], py[lm.index] - py[ai]]
                    if obs_others:
                        for b in agents:
                            if b is not a:
                                rows += [
                                    px[b.index] - px[ai], py[b.index] - py[ai]
                                ]
                rows.append(rew)
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = tuple(
                    extra[i * obs_w : (i + 1) * obs_w].T for i in range(A)
                )
                rew = extra[A * obs_w]
                rews = tuple(rew for _ in range(A))
                terminated = jnp.zeros((state.batch_dim,), bool)
                return obs, rews, terminated, {"rew": rew}

        return SimpleSpreadOutputs()
