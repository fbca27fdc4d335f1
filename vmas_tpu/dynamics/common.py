"""Dynamics base class.

Behavioral reference: /root/reference/vmas/simulator/dynamics/common.py.
``process_action`` is functional: it reads the agent's decoded action from
``state.u`` and returns a new state with ``state.force``/``state.torque`` rows
written. Stateful models (Drone) keep their hidden state in ``state.dyn``.
"""

from __future__ import annotations

import abc
from abc import ABC

import jax.numpy as jnp
import numpy as np


def stack_u(state, agents):
    """[B, A, W] stack of the group's decoded actions (equal widths —
    the grouping key includes action_size)."""
    return jnp.stack([a.u(state) for a in agents], axis=1)


def gather_body(state, agents):
    """(pos [B,A,2], rot [B,A], vel [B,A,2], ang_vel [B,A]) for the group."""
    idx = np.asarray([a.index for a in agents])
    return state.pos[:, idx], state.rot[:, idx], state.vel[:, idx], state.ang_vel[:, idx]


def scatter_force(state, agents, force):
    """Write force [B, A, 2] to the group's entity rows — the batched form
    of per-agent ``set_force`` (same values, disjoint rows)."""
    idx = np.asarray([a.index for a in agents])
    return state.replace(force=state.force.at[:, idx].set(jnp.asarray(force, jnp.float32)))


def scatter_torque(state, agents, torque):
    idx = np.asarray([a.index for a in agents])
    return state.replace(torque=state.torque.at[:, idx].set(jnp.asarray(torque, jnp.float32)))


class Dynamics(ABC):
    def __init__(self):
        self._agent = None
        self.world = None  # set by World.add_agent (or the ctor for models that need dt)

    @property
    def agent(self):
        if self._agent is None:
            raise ValueError(
                "You need to add the dynamics to an agent during construction before accessing its properties"
            )
        return self._agent

    @agent.setter
    def agent(self, value):
        if self._agent is not None:
            raise ValueError("Agent in dynamics has already been set")
        self._agent = value

    # hidden-state lifecycle (reference Dynamics.reset/zero_grad)
    def init_state(self, batch_dim: int):
        return ()

    # -- agent-axis batching --------------------------------------------
    # The reference applies dynamics in a per-agent Python loop
    # (core.py:1994-2003 via scenario.py:91-97). Under jit that unrolls to
    # N independent small-op chains, and at many-agent counts (road_traffic's
    # 20 bicycles) the step becomes bound by the sheer number of tiny fused
    # kernels, not by math. Models whose process_action is elementwise in the
    # agent axis advertise a ``batch_spec`` key; the environment groups
    # same-key agents at build time and runs ONE [B, A]-shaped
    # ``process_action_batch`` for the group. The math is element-for-
    # element the per-agent loop's, but XLA may contract the stacked shapes
    # differently (FMA/SIMD choice), so results match to ~1 ulp/step, not
    # bitwise (asserted by tests/test_dynamics_batch.py) — which is why the
    # grouping is an opt-in knob (see Environment._plan_process_action).
    def batch_spec(self):
        """Hashable grouping key, or None if this model must run per-agent
        (stateful models like Drone, or anything non-elementwise)."""
        return None

    def batch_exact(self) -> bool:
        """True when process_action_batch is BITWISE equal to the per-agent
        loop — i.e. the batched form is pure data movement (slicing/
        stacking/scatter), no transcendental whose stacked-shape XLA
        contraction could drift (kinematic_bicycle measured ~1 ulp/step).
        Exact models group by default; ulp-tier models only under
        VMAS_TPU_BATCH_DYNAMICS=1 (see Environment._plan_process_action)."""
        return False

    def process_action_batch(self, world, state, agents):
        """Process a whole same-``batch_spec`` agent group in one batched
        computation. Only called when ``batch_spec()`` returned non-None."""
        raise NotImplementedError

    def check_and_process_action(self, world, state):
        u = self.agent.u(state)
        if u.shape[1] < self.needed_action_size:
            raise ValueError(
                f"Agent action size {u.shape[1]} is less than the required "
                f"dynamics action size {self.needed_action_size}"
            )
        return self.process_action(world, state)

    @property
    @abc.abstractmethod
    def needed_action_size(self) -> int: ...

    @abc.abstractmethod
    def process_action(self, world, state): ...
