"""3D quadrotor dynamics projected onto the 2D world.

Behavioral reference: /root/reference/vmas/simulator/dynamics/drone.py.
The hidden 12-dim state (roll, pitch, yaw, body rates, world velocities,
position) lives in ``state.dyn[agent.slot]`` — the functional counterpart of
the reference's ``self.drone_state`` buffer.
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.dynamics.common import Dynamics


class Drone(Dynamics):
    def __init__(self, world, I_xx: float = 8.1e-3, I_yy: float = 8.1e-3, I_zz: float = 14.2e-3, integration: str = "rk4"):
        super().__init__()
        assert integration in ("rk4", "euler")
        self.integration = integration
        self.I_xx = I_xx
        self.I_yy = I_yy
        self.I_zz = I_zz
        self.world = world
        self.g = 9.81
        self.dt = world.dt

    def init_state(self, batch_dim: int):
        # [phi, theta, psi, p, q, r, x_dot, y_dot, z_dot, x, y, z]
        return jnp.zeros((batch_dim, 12), jnp.float32)

    def f(self, state, thrust_command, torque_command):
        phi, theta, psi = state[:, 0], state[:, 1], state[:, 2]
        p, q, r = state[:, 3], state[:, 4], state[:, 5]
        x_dot, y_dot, z_dot = state[:, 6], state[:, 7], state[:, 8]

        c_phi, s_phi = jnp.cos(phi), jnp.sin(phi)
        c_theta, s_theta = jnp.cos(theta), jnp.sin(theta)
        c_psi, s_psi = jnp.cos(psi), jnp.sin(psi)

        m = self.agent.mass
        x_ddot = (c_phi * s_theta * c_psi + s_phi * s_psi) * thrust_command / m
        y_ddot = (c_phi * s_theta * s_psi - s_phi * c_psi) * thrust_command / m
        z_ddot = (c_phi * c_theta) * thrust_command / m - self.g
        p_dot = (torque_command[:, 0] - (self.I_yy - self.I_zz) * q * r) / self.I_xx
        q_dot = (torque_command[:, 1] - (self.I_zz - self.I_xx) * p * r) / self.I_yy
        r_dot = (torque_command[:, 2] - (self.I_xx - self.I_yy) * p * q) / self.I_zz

        return jnp.stack(
            [p, q, r, p_dot, q_dot, r_dot, x_ddot, y_ddot, z_ddot, x_dot, y_dot, z_dot],
            axis=-1,
        )

    def needs_reset(self, state) -> jnp.ndarray:
        """[B] bool: roll/pitch beyond +-30 deg (reference drone.py:107-109)."""
        ds = self.agent.dyn_state(state)
        return jnp.any(jnp.abs(ds[:, :2]) > 30 * (jnp.pi / 180), axis=-1)

    def euler(self, state, thrust, torque):
        return self.dt * self.f(state, thrust, torque)

    def runge_kutta(self, state, thrust, torque):
        k1 = self.f(state, thrust, torque)
        k2 = self.f(state + self.dt * k1 / 2, thrust, torque)
        k3 = self.f(state + self.dt * k2 / 2, thrust, torque)
        k4 = self.f(state + self.dt * k3, thrust, torque)
        return (self.dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    @property
    def needed_action_size(self) -> int:
        return 4

    def process_action(self, world, state):
        agent = self.agent
        u = agent.u(state)
        thrust = u[:, 0] + agent.mass * self.g  # hover compensation
        torque = u[:, 1:4]

        ds = agent.dyn_state(state)
        ds = ds.at[:, 9].set(agent.pos(state)[:, 0])
        ds = ds.at[:, 10].set(agent.pos(state)[:, 1])
        ds = ds.at[:, 2].set(agent.rot(state))

        if self.integration == "euler":
            delta = self.euler(ds, thrust, torque)
        else:
            delta = self.runge_kutta(ds, thrust, torque)
        ds = ds + delta
        state = agent.set_dyn_state(state, ds)

        vel = agent.vel(state)
        acc_x = (delta[:, 6] - vel[:, 0] * self.dt) / self.dt**2
        acc_y = (delta[:, 7] - vel[:, 1] * self.dt) / self.dt**2
        acc_ang = (delta[:, 5] - agent.ang_vel(state) * self.dt) / self.dt**2

        state = agent.set_force(state, jnp.stack([acc_x, acc_y], axis=-1) * agent.mass)
        return agent.set_torque(state, agent.moment_of_inertia * acc_ang)
