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

    def batch_spec(self):
        return ("forward",)

    def process_action_batch(self, world, state, agents):
        from vmas_tpu.dynamics.common import gather_body, scatter_force, stack_u

        u = stack_u(state, agents)  # [B, A, W]
        _, rot, _, _ = gather_body(state, agents)  # rot [B, A]
        force_local = jnp.stack([u[:, :, 0], jnp.zeros_like(u[:, :, 0])], axis=-1)
        force = JaxUtils.rotate_vector(force_local, rot)
        return scatter_force(state, agents, force)
