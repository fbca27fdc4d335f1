"""Compiled rollouts.

The reference steps the world from Python once per env.step; the TPU-native
fast path compiles K steps into one XLA program with ``lax.scan`` (SURVEY.md
section 2.13: the long-rollout analog of sequence parallelism), so HBM never
round-trips to host between steps and XLA can overlap/fuse across steps.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def rollout_fn(env, policy: Optional[Callable] = None, horizon: int = 100):
    """Build ``(state, steps, key) -> (state', steps', traj)`` scanning
    ``horizon`` env steps.

    ``policy(obs_tuple, key) -> actions_tuple`` defaults to uniform random
    actions in each agent's range. The returned function is jit-compatible and
    shards over the env axis like everything else.
    """
    scenario, world = env.scenario, env.world
    agents = env.agents
    random_pol = policy is None

    def one_step(carry, xs):
        state, steps = carry
        pol_input, step_keys = xs
        if random_pol:
            # pre-sampled uniforms [A, B, act_max] -> per-agent ranges
            actions = tuple(
                pol_input[i, :, : a.action_size] * jnp.asarray(a.u_range_array)[None]
                for i, a in enumerate(agents)
            )
        else:
            obs = tuple(scenario.observation(a, state) for a in agents)
            actions = policy(obs, pol_input)
        for i, a in enumerate(agents):
            state = env._decode_action(state, a, actions[i], step_keys[i])
        for a in world.agents:
            state = scenario.env_process_action(a, state)
        state = scenario.pre_step(state)
        state = world.step(state)
        state = scenario.post_step(state)
        state = scenario.pre_rewards(state)
        rews = jnp.stack([scenario.reward(a, state) for a in agents], axis=-1)
        state = scenario.post_rewards(state)
        done = scenario.done(state)
        steps = steps + 1
        return (state, steps), (rews, done)

    def run(state, steps, key):
        # RNG hoisted out of the scan body: one batched draw for the whole
        # horizon instead of a serial threefry chain per step (the chain
        # costs ~10x the physics on TPU).
        k_pol, k_step = jax.random.split(key)
        act_max = max((a.action_size for a in agents), default=1)
        if random_pol:
            pol_xs = jax.random.uniform(
                k_pol,
                (horizon, len(agents), env.num_envs, act_max),
                minval=-1.0,
                maxval=1.0,
            )
        else:
            pol_xs = jax.random.split(k_pol, horizon)
        step_keys = jax.random.split(k_step, (horizon, max(len(agents), 1)))
        (state, steps), (rews, dones) = jax.lax.scan(
            one_step, (state, steps), (pol_xs, step_keys), length=horizon
        )
        return state, steps, {"rewards": rews, "dones": dones}

    return run


def rollout(env, policy=None, horizon: int = 100, key=None):
    """Convenience: run a compiled rollout on the env's current state."""
    if key is None:
        key = env._next_key()
    fn = jax.jit(rollout_fn(env, policy, horizon))
    env.state, env.steps, traj = fn(env.state, env.steps, key)
    return traj
