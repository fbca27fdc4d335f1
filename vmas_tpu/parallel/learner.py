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
    """
    scenario, world = env.scenario, env.world
    agents = env.agents

    def loss_fn(params, state, steps, key):
        total = 0.0
        for t in range(horizon):
            obs = tuple(scenario.observation(a, state) for a in agents)
            for i, a in enumerate(agents):
                act = mlp(params, obs[i]) * jnp.asarray(a.u_range_array)[None]
                state = a.set_u(state, act)
            for a in world.agents:
                state = scenario.env_process_action(a, state)
            state = scenario.pre_step(state)
            state = world.step(state)
            state = scenario.post_step(state)
            state = scenario.pre_rewards(state)
            rews = jnp.stack([scenario.reward(a, state) for a in agents], axis=-1)
            state = scenario.post_rewards(state)
            total = total + jnp.mean(rews)
        return -total / horizon, (state, steps + horizon)

    def train_step(params, state, steps, key):
        (loss, (state, steps)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, steps, key
        )
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, state, steps, loss

    return train_step
