"""Reference: /root/reference/vmas/simulator/dynamics/forward.py."""

import jax.numpy as jnp

from vmas_tpu.core.utils import JaxUtils
from vmas_tpu.dynamics.common import Dynamics


class Forward(Dynamics):
    @property
    def needed_action_size(self) -> int:
        return 1

    def process_action(self, world, state):
        u = self.agent.u(state)
        force_local = jnp.stack([u[:, 0], jnp.zeros_like(u[:, 0])], axis=-1)
        force = JaxUtils.rotate_vector(force_local, self.agent.rot(state))
        return self.agent.set_force(state, force)
