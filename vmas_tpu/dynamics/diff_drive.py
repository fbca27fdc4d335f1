"""Differential-drive (unicycle) dynamics.

Behavioral reference: /root/reference/vmas/simulator/dynamics/diff_drive.py.
Integrates the unicycle ODE over one dt (euler or RK4) and converts the state
delta into the force/torque that realizes it under the world's semi-implicit
Euler integrator (inverse dynamics: a = (delta - v dt) / dt^2).
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.dynamics.common import Dynamics


class DiffDrive(Dynamics):
    def __init__(self, world, integration: str = "rk4"):
        super().__init__()
        assert integration in ("rk4", "euler")
        self.dt = world.dt
        self.integration = integration
        self.world = world

    def f(self, state, u_command, ang_vel_command):
        theta = state[..., 2]
        dx = u_command * jnp.cos(theta)
        dy = u_command * jnp.sin(theta)
        return jnp.stack((dx, dy, ang_vel_command), axis=-1)

    def euler(self, state, u_command, ang_vel_command):
        return self.dt * self.f(state, u_command, ang_vel_command)

    def runge_kutta(self, state, u_command, ang_vel_command):
        k1 = self.f(state, u_command, ang_vel_command)
        k2 = self.f(state + self.dt * k1 / 2, u_command, ang_vel_command)
        k3 = self.f(state + self.dt * k2 / 2, u_command, ang_vel_command)
        k4 = self.f(state + self.dt * k3, u_command, ang_vel_command)
        return (self.dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self, world, state):
        agent = self.agent
        u = agent.u(state)
        u_command, ang_vel_command = u[:, 0], u[:, 1]

        cur = jnp.concatenate([agent.pos(state), agent.rot(state)[:, None]], axis=1)
        if self.integration == "euler":
            delta = self.euler(cur, u_command, ang_vel_command)
        else:
            delta = self.runge_kutta(cur, u_command, ang_vel_command)

        vel = agent.vel(state)
        acc_xy = (delta[:, :2] - vel * self.dt) / self.dt**2
        acc_ang = (delta[:, 2] - agent.ang_vel(state) * self.dt) / self.dt**2

        state = agent.set_force(state, agent.mass * acc_xy)
        return agent.set_torque(state, agent.moment_of_inertia * acc_ang)

    def batch_spec(self):
        return ("diff_drive", self.dt, self.integration)

    def process_action_batch(self, world, state, agents):
        """One [B, A] evaluation of the group — ``f`` is elementwise in the
        agent axis, so this is the per-agent loop bit for bit."""
        import numpy as np

        from vmas_tpu.dynamics.common import (
            gather_body, scatter_force, scatter_torque, stack_u,
        )

        u = stack_u(state, agents)  # [B, A, W]
        u_command, ang_vel_command = u[:, :, 0], u[:, :, 1]

        pos, rot, vel, ang_vel = gather_body(state, agents)
        cur = jnp.concatenate([pos, rot[..., None]], axis=-1)  # [B, A, 3]
        if self.integration == "euler":
            delta = self.euler(cur, u_command, ang_vel_command)
        else:
            delta = self.runge_kutta(cur, u_command, ang_vel_command)

        acc_xy = (delta[..., :2] - vel * self.dt) / self.dt**2
        acc_ang = (delta[..., 2] - ang_vel * self.dt) / self.dt**2

        mass = np.asarray([a.mass for a in agents], np.float32)
        moi = np.asarray([a.moment_of_inertia for a in agents], np.float32)
        state = scatter_force(state, agents, mass[None, :, None] * acc_xy)
        return scatter_torque(state, agents, moi[None] * acc_ang)
