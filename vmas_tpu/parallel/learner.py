"""A minimal sharded learner fed by the sharded simulator.

Demonstrates the BASELINE.json north-star topology: each chip steps its env
shard in lockstep and feeds a data-parallel learner; parameters are
replicated, gradients all-reduce over ICI — XLA inserts the collectives from
the shardings, no manual psum needed. The sim is differentiable, so the demo
trains by analytic policy gradients THROUGH the physics (first-class
differentiability, reference environment.py:615-619 grad_enabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp(key, sizes):
    params = []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        k1, key = jax.random.split(key)
        params.append(
            {
                "w": jax.random.normal(k1, (m, n), jnp.float32) / jnp.sqrt(m),
                "b": jnp.zeros((n,), jnp.float32),
            }
        )
    return params


def mlp(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return jnp.tanh(x)  # actions in [-1, 1]


def make_train_step(env, horizon: int = 5, lr: float = 1e-3):
    """(params, state, steps, key) -> (params', state', steps', loss).

    Differentiable-rollout policy optimization: loss = -mean reward over an
    unrolled horizon, gradients flow through the physics. With env-sharded
    state and replicated params, the parameter gradient is a cross-chip
    all-reduce that XLA places on ICI automatically.

    The rollout body is the ENVIRONMENT'S OWN step function, so action
    semantics (u_multiplier, u_noise, comm) match env.step exactly — which
    requires ``grad_enabled=True`` so the decode doesn't stop the policy
    gradient. Episode boundaries are the caller's job: keep ``horizon`` below
    the episode length and call ``env.reset_mask(done)`` between train steps
    for episodic scenarios.
    """
    assert env.grad_enabled, (
        "make_train_step differentiates through the env's action decode; "
        "build the env with grad_enabled=True"
    )
    agents = env.agents

    def policy_actions(params, obs):
        actions = []
        for i, a in enumerate(agents):
            w = mlp(params, obs[i])  # [-1, 1]
            u = w[:, : a.action_size] * jnp.asarray(a.u_range_array)[None]
            if env.world.dim_c != 0 and not a.silent:
                # exactly dim_c comm columns — the shared MLP may be sized to
                # the WIDEST agent, so an open slice would grab padding too
                comm = (w[:, a.action_size : a.action_size + env.world.dim_c] + 1) / 2
                u = jnp.concatenate([u, comm], axis=-1)
            actions.append(u)
        return tuple(actions)

    def loss_fn(params, state, steps, key):
        total = 0.0
        # the env's own obs pipeline (plural batch hook aware), not a
        # per-agent re-derivation
        obs = env._obs_fn_raw(state, jax.random.fold_in(key, horizon))
        for t in range(horizon):
            actions = policy_actions(params, obs)
            state, obs, rews, terminated, truncated, infos, steps = env._step_fn_raw(
                state, steps, actions, jax.random.fold_in(key, t)
            )
            total = total + jnp.mean(jnp.stack(rews, axis=-1))
        return -total / horizon, (state, steps)

    def train_step(params, state, steps, key):
        (loss, (state, steps)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, steps, key
        )
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, state, steps, loss

    return train_step
