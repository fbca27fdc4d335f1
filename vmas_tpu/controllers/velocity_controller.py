"""Vectorized PID velocity controller.

Behavioral reference:
/root/reference/vmas/simulator/controllers/velocity_controller.py.
The controller's integrator/derivative memory lives in the scenario scratch
under ``state.scenario[self.key]``, initialized by :meth:`reset` inside the
scenario's ``reset_world_at`` (partial resets are handled by the environment's
masked blend).
"""

from __future__ import annotations

import math
import warnings

import jax.numpy as jnp

from vmas_tpu.core.state import WorldState


class VelocityController:
    def __init__(self, agent, world, ctrl_params=(1, 0, 0), pid_form="standard"):
        self.agent = agent
        self.world = world
        self.dt = world.dt
        self.key = f"__vel_ctrl_{agent.name}"
        self.ctrl_gain = ctrl_params[0]
        if pid_form == "standard":
            self.integralTs = ctrl_params[1]
            self.derivativeTs = ctrl_params[2]
        elif pid_form == "parallel":
            self.integralTs = 0.0 if ctrl_params[1] == 0 else self.ctrl_gain / ctrl_params[1]
            self.derivativeTs = ctrl_params[2] / self.ctrl_gain
        else:
            raise Exception("PID form is either standard or parallel.")

        self.use_integrator = self.integralTs != 0
        self.integrator_windup_cutoff = None
        if self.use_integrator:
            fmax = min(
                self.agent.max_f,
                self.agent.f_range,
                key=lambda x: x if x is not None else math.inf,
            )
            if fmax is not None:
                self.integrator_windup_cutoff = (
                    0.5 * fmax * self.integralTs / (self.dt * self.ctrl_gain)
                )
            else:
                warnings.warn("Force limits not specified. Integrator can wind up!")

    def reset(self, state: WorldState, env_mask=None) -> WorldState:
        """Zero the PID memory; with ``env_mask`` ([B] bool) only masked envs
        are zeroed (reference VelocityController.reset(index),
        velocity_controller.py:76-88)."""
        B = state.batch_dim
        zeros = {
            "accum_errs": jnp.zeros((B, 2), jnp.float32),
            "prev_err": jnp.zeros((B, 2), jnp.float32),
        }
        scratch = dict(state.scenario)
        if env_mask is not None and self.key in scratch:
            old = scratch[self.key]
            m = env_mask[:, None]
            zeros = {k: jnp.where(m, zeros[k], old[k]) for k in zeros}
        scratch[self.key] = zeros
        return state.replace(scenario=scratch)

    def process_force(self, state: WorldState) -> WorldState:
        cs = state.scenario[self.key]
        accum, prev = cs["accum_errs"], cs["prev_err"]

        des_vel = self.agent.u(state)
        cur_vel = self.agent.vel(state)
        err = des_vel - cur_vel

        if self.use_integrator:
            accum = accum + self.dt * err
            if self.integrator_windup_cutoff is not None:
                accum = jnp.clip(accum, -self.integrator_windup_cutoff, self.integrator_windup_cutoff)
            i_term = (1.0 / self.integralTs) * accum
        else:
            i_term = 0.0

        d_term = self.derivativeTs * (err - prev) / self.dt
        prev = err

        u = self.ctrl_gain * (err + i_term + d_term) * self.agent.mass
        scratch = dict(state.scenario)
        scratch[self.key] = {"accum_errs": accum, "prev_err": prev}
        state = state.replace(scenario=scratch)
        return self.agent.set_u(state, u)
