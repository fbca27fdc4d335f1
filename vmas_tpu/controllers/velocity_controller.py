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

    def rows_step(self):
        """The per-component PID update as kernel-row ops, for the fused
        kernel's in-kernel process_action (fused.FusedOutputs
        process_act_rows — the rows-carried rollout). Returns
        ``step(ux, uy, vx, vy, acx, acy, prx, pry, reset_mask) ->
        (fx, fy, acx', acy', prx', pry')`` performing EXACTLY the ops of
        :meth:`reset`'s masked zeroing + :meth:`process_force` (operation
        order preserved so the result is bitwise the XLA path's)."""
        dt = float(self.dt)
        gain = float(self.ctrl_gain)
        mass = float(self.agent.mass)
        use_i = bool(self.use_integrator)
        inv_ti = float(1.0 / self.integralTs) if use_i else 0.0
        cutoff = self.integrator_windup_cutoff
        td = float(self.derivativeTs)

        def step(ux, uy, vx, vy, acx, acy, prx, pry, reset_mask):
            if reset_mask is not None:
                acx = jnp.where(reset_mask, 0.0, acx)
                acy = jnp.where(reset_mask, 0.0, acy)
                prx = jnp.where(reset_mask, 0.0, prx)
                pry = jnp.where(reset_mask, 0.0, pry)
            ex, ey = ux - vx, uy - vy
            if use_i:
                acx = acx + dt * ex
                acy = acy + dt * ey
                if cutoff is not None:
                    c = float(cutoff)
                    acx = jnp.clip(acx, -c, c)
                    acy = jnp.clip(acy, -c, c)
                i_x = inv_ti * acx
                i_y = inv_ti * acy
            else:
                i_x = i_y = 0.0
            d_x = td * (ex - prx) / dt
            d_y = td * (ey - pry) / dt
            fx = gain * (ex + i_x + d_x) * mass
            fy = gain * (ey + i_y + d_y) * mass
            return fx, fy, acx, acy, ex, ey

        return step

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
