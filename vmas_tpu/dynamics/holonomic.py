"""Reference: /root/reference/vmas/simulator/dynamics/holonomic.py."""

from vmas_tpu.dynamics.common import Dynamics


class Holonomic(Dynamics):
    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self, world, state):
        return self.agent.set_force(state, self.agent.u(state)[:, :2])

    def batch_spec(self):
        return ("holonomic",)

    def batch_exact(self) -> bool:
        return True  # pure slice/stack/scatter — no float op changes shape-dependently

    def process_action_batch(self, world, state, agents):
        from vmas_tpu.dynamics.common import scatter_force, stack_u

        return scatter_force(state, agents, stack_u(state, agents)[:, :, :2])
