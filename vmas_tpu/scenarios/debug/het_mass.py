"""Debug: heterogeneous mass.

Behavioral reference: /root/reference/vmas/scenarios/debug/het_mass.py.
The reference perturbs agent masses with host randomness at every reset
(het_mass.py:47-53); mass is compile-time static in the TPU build, so the
perturbation is drawn once at world construction — the scenario's purpose
(testing heterogeneous-mass dynamics) is preserved.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, World
from vmas_tpu.core.utils import Y, safe_norm
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        self.green_mass = kwargs.pop("green_mass", 4)
        self.blue_mass = kwargs.pop("blue_mass", 2)
        self.mass_noise = kwargs.pop("mass_noise", 1)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        self.plot_grid = True

        rng = np.random.RandomState(0)
        world = World(batch_dim, device)
        self.green_agent = Agent(
            name="agent 0", collide=False, color=Color.GREEN, render_action=True,
            mass=float(self.green_mass + rng.uniform(-self.mass_noise, self.mass_noise)),
            f_range=1,
        )
        world.add_agent(self.green_agent)
        self.blue_agent = Agent(
            name="agent 1", collide=False, render_action=True,
            mass=float(self.blue_mass + rng.uniform(-self.mass_noise, self.mass_noise)),
            f_range=1,
        )
        world.add_agent(self.blue_agent)
        return world

    def reset_world_at(self, state, key):
        import jax

        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state,
                jax.random.uniform(jax.random.fold_in(key, i), (state.batch_dim, 2), minval=-1, maxval=1),
            )
        scratch = dict(state.scenario)
        scratch.setdefault("max_speed", jnp.zeros((state.batch_dim,), jnp.float32))
        scratch.setdefault("energy_expenditure", jnp.zeros((state.batch_dim,), jnp.float32))
        return state.replace(scenario=scratch)

    def process_action(self, agent, state):
        u = agent.u(state)
        return agent.set_u(state, u.at[:, Y].set(0.0))

    def pre_rewards(self, state):
        scratch = dict(state.scenario)
        scratch["max_speed"] = jnp.max(
            jnp.stack([safe_norm(a.vel(state)) for a in self.world.agents], axis=1), axis=1
        )
        scratch["energy_expenditure"] = (
            -jnp.stack(
                [
                    safe_norm(a.u(state)) / math.sqrt(self.world.dim_p * (1.0**2))
                    for a in self.world.agents
                ],
                axis=1,
            ).sum(-1)
            * 0.17
        )
        return state.replace(scenario=scratch)

    def reward(self, agent, state):
        return state.scenario["max_speed"] + state.scenario["energy_expenditure"]

    def observation(self, agent, state):
        return jnp.concatenate([agent.pos(state), agent.vel(state)], axis=-1)

    def info(self, agent, state):
        return {
            "max_speed": state.scenario["max_speed"],
            "energy_expenditure": state.scenario["energy_expenditure"],
        }

    # ------------------------------------------------------------------
    def make_fused_outputs(self, world):
        """Emit obs/reward as extra rows of the fused physics kernel
        (fused.FusedOutputs); the energy term reads the untouched actions
        in unpack."""
        import math as _math

        from vmas_tpu.core import fused as F_

        agents = world.policy_agents
        A = len(agents)
        denom = _math.sqrt(world.dim_p * (1.0**2))

        class HetMassOutputs(F_.FusedOutputs):
            n_scratch_in = 0
            n_out = 4 * A + 1
            # NOT rows-eligible (no carry_extra_idx): the scenario's
            # process_action zeroes u's Y component outside the kernel, and
            # unpack's energy term reads that post-zeroed u

            @staticmethod
            def emit(ctx):
                px, py = ctx["px"], ctx["py"]
                vx, vy = ctx["vx"], ctx["vy"]
                max_speed = None
                rows = []
                for a in agents:
                    ai = a.index
                    rows += [px[ai], py[ai], vx[ai], vy[ai]]
                    s = F_._norm(vx[ai], vy[ai])
                    max_speed = s if max_speed is None else jnp.maximum(max_speed, s)
                rows.append(max_speed)
                return rows

            @staticmethod
            def unpack(extra, state):
                obs = tuple(extra[i * 4 : (i + 1) * 4].T for i in range(A))
                max_speed = extra[4 * A]
                energy = (
                    -jnp.stack(
                        [safe_norm(a.u(state)) / denom for a in agents], axis=1
                    ).sum(-1)
                    * 0.17
                )
                rew = max_speed + energy
                rews = tuple(rew for _ in range(A))
                done = jnp.zeros((state.batch_dim,), bool)
                updates = {"max_speed": max_speed, "energy_expenditure": energy}
                return obs, rews, done, updates

        return HetMassOutputs()
