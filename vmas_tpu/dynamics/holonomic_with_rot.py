"""Reference: /root/reference/vmas/simulator/dynamics/holonomic_with_rot.py."""

from vmas_tpu.dynamics.common import Dynamics


class HolonomicWithRotation(Dynamics):
    @property
    def needed_action_size(self) -> int:
        return 3

    def process_action(self, world, state):
        u = self.agent.u(state)
        state = self.agent.set_force(state, u[:, :2])
        return self.agent.set_torque(state, u[:, 2])

    def batch_spec(self):
        return ("holonomic_with_rotation",)

    def batch_exact(self) -> bool:
        return True  # pure slice/stack/scatter — no float op changes shape-dependently

    def process_action_batch(self, world, state, agents):
        from vmas_tpu.dynamics.common import scatter_force, scatter_torque, stack_u

        u = stack_u(state, agents)
        state = scatter_force(state, agents, u[:, :, :2])
        return scatter_torque(state, agents, u[:, :, 2])
