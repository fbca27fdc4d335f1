"""MPE simple_crypto (Alice/Bob/Eve encrypted communication).

Behavioral reference: /root/reference/vmas/scenarios/mpe/simple_crypto.py.
The per-env binary key/secret tensors (simple_crypto.py:52-89) live in
scenario scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmas_tpu.core import Agent, Color, World
from vmas_tpu.scenario import BaseScenario
from vmas_tpu.utils import ScenarioUtils


class Scenario(BaseScenario):
    def make_world(self, batch_dim: int, device=None, **kwargs):
        dim_c = kwargs.pop("dim_c", 4)
        ScenarioUtils.check_kwargs_consumed(kwargs)
        assert dim_c > 0
        self.dim_c = dim_c

        world = World(batch_dim=batch_dim, device=device, dim_c=dim_c)
        for i in range(3):
            adversary = i < 1
            speaker = i == 2
            agent = Agent(
                name=("eve_0" if adversary else ("alice_0" if speaker else "bob_0")),
                collide=False, movable=False,
                color=(Color.RED if adversary else (Color.GREEN if speaker else Color.BLUE)),
                adversary=adversary, silent=False,
            )
            agent.speaker = speaker
            world.add_agent(agent)
        return world

    def reset_world_at(self, state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        B = state.batch_dim
        for i, agent in enumerate(self.world.agents):
            state = agent.set_pos(
                state, jax.random.uniform(jax.random.fold_in(k3, i), (B, 2), minval=-1.0, maxval=1.0)
            )
        scratch = dict(state.scenario)
        scratch["key"] = jax.random.randint(k1, (B, self.dim_c), 0, 2).astype(jnp.float32)
        scratch["secret"] = jax.random.randint(k2, (B, self.dim_c), 0, 2).astype(jnp.float32)
        return state.replace(scenario=scratch)

    def good_listeners(self):
        return [a for a in self.world.agents if not a.adversary and not a.speaker]

    def adversaries(self):
        return [a for a in self.world.agents if a.adversary]

    def _masked_sq_err(self, state, a, secret):
        c = a.comm(state)
        zero_comms = jnp.all(c == 0.0, axis=-1)
        err = jnp.sum(jnp.square(c - secret), axis=-1)
        return jnp.where(zero_comms, 0.0, err)

    def reward(self, agent, state):
        secret = state.scenario["secret"]
        if agent.adversary:
            return -self._masked_sq_err(state, agent, secret)
        good = -sum(self._masked_sq_err(state, a, secret) for a in self.good_listeners())
        adv = sum(self._masked_sq_err(state, a, secret) for a in self.adversaries())
        return good + adv

    def observation(self, agent, state):
        comm = [o.comm(state) for o in self.world.agents if o is not agent and o.speaker]
        key = state.scenario["key"]
        secret = state.scenario["secret"]
        if agent.speaker:
            return jnp.concatenate([secret, key], axis=-1)
        if not agent.adversary:
            return jnp.concatenate([key, *comm], axis=-1)
        return jnp.concatenate(comm, axis=-1)
