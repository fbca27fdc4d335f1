"""Reference: /root/reference/vmas/simulator/dynamics/roatation.py (upstream
filename typo corrected here)."""

from vmas_tpu.dynamics.common import Dynamics


class Rotation(Dynamics):
    @property
    def needed_action_size(self) -> int:
        return 1

    def process_action(self, world, state):
        return self.agent.set_torque(state, self.agent.u(state)[:, 0])

    def batch_spec(self):
        return ("rotation",)

    def batch_exact(self) -> bool:
        return True  # pure slice/stack/scatter — no float op changes shape-dependently

    def process_action_batch(self, world, state, agents):
        from vmas_tpu.dynamics.common import scatter_torque, stack_u

        return scatter_torque(state, agents, stack_u(state, agents)[:, :, 0])
