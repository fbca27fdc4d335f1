"""Kinematic bicycle model (Polack et al. 2017, eq. 2).

Behavioral reference: /root/reference/vmas/simulator/dynamics/kinematic_bicycle.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from vmas_tpu.dynamics.common import Dynamics


class KinematicBicycle(Dynamics):
    def __init__(self, world, width: float, l_f: float, l_r: float, max_steering_angle: float, integration: str = "rk4"):
        super().__init__()
        assert integration in ("rk4", "euler"), "Integration method must be 'euler' or 'rk4'."
        self.width = width
        self.l_f = l_f
        self.l_r = l_r
        self.max_steering_angle = max_steering_angle
        self.dt = world.dt
        self.integration = integration
        self.world = world

    def f(self, state, steering_command, v_command):
        theta = state[..., 2]
        beta = jnp.arctan2(jnp.tan(steering_command) * self.l_r / (self.l_f + self.l_r), 1.0)
        dx = v_command * jnp.cos(theta + beta)
        dy = v_command * jnp.sin(theta + beta)
        dtheta = v_command / (self.l_f + self.l_r) * jnp.cos(beta) * jnp.tan(steering_command)
        return jnp.stack((dx, dy, dtheta), axis=-1)

    def euler(self, state, steering_command, v_command):
        return self.dt * self.f(state, steering_command, v_command)

    def runge_kutta(self, state, steering_command, v_command):
        k1 = self.f(state, steering_command, v_command)
        k2 = self.f(state + self.dt * k1 / 2, steering_command, v_command)
        k3 = self.f(state + self.dt * k2 / 2, steering_command, v_command)
        k4 = self.f(state + self.dt * k3, steering_command, v_command)
        return (self.dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)

    @property
    def needed_action_size(self) -> int:
        return 2

    def process_action(self, world, state):
        agent = self.agent
        u = agent.u(state)
        v_command = u[:, 0]
        steering_command = jnp.clip(u[:, 1], -self.max_steering_angle, self.max_steering_angle)

        cur = jnp.concatenate([agent.pos(state), agent.rot(state)[:, None]], axis=1)
        if self.integration == "euler":
            delta = self.euler(cur, steering_command, v_command)
        else:
            delta = self.runge_kutta(cur, steering_command, v_command)

        vel = agent.vel(state)
        acc_xy = (delta[:, :2] - vel * self.dt) / self.dt**2
        acc_ang = (delta[:, 2] - agent.ang_vel(state) * self.dt) / self.dt**2

        state = agent.set_force(state, agent.mass * acc_xy)
        return agent.set_torque(state, agent.moment_of_inertia * acc_ang)

    def batch_spec(self):
        return (
            "kinematic_bicycle", self.width, self.l_f, self.l_r,
            self.max_steering_angle, self.dt, self.integration,
        )

    def process_action_batch(self, world, state, agents):
        """One [B, A] evaluation of the group — ``f`` is elementwise in the
        agent axis, so this is the per-agent loop's math row for row (XLA's
        shape-dependent FMA/SIMD choices leave ~1 ulp/step; see common.py)."""
        import numpy as np

        from vmas_tpu.dynamics.common import (
            gather_body, scatter_force, scatter_torque, stack_u,
        )

        u = stack_u(state, agents)  # [B, A, W]
        v_command = u[:, :, 0]
        steering_command = jnp.clip(u[:, :, 1], -self.max_steering_angle, self.max_steering_angle)

        pos, rot, vel, ang_vel = gather_body(state, agents)
        cur = jnp.concatenate([pos, rot[..., None]], axis=-1)  # [B, A, 3]
        if self.integration == "euler":
            delta = self.euler(cur, steering_command, v_command)
        else:
            delta = self.runge_kutta(cur, steering_command, v_command)

        acc_xy = (delta[..., :2] - vel * self.dt) / self.dt**2
        acc_ang = (delta[..., 2] - ang_vel * self.dt) / self.dt**2

        mass = np.asarray([a.mass for a in agents], np.float32)
        moi = np.asarray([a.moment_of_inertia for a in agents], np.float32)
        state = scatter_force(state, agents, mass[None, :, None] * acc_xy)
        return scatter_torque(state, agents, moi[None] * acc_ang)
