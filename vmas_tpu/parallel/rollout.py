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

    def random_policy(obs, key):
        acts = []
        for i, a in enumerate(agents):
            k = jax.random.fold_in(key, i)
            r = jnp.asarray(a.u_range_array)
            acts.append(
                jax.random.uniform(
                    k, (env.num_envs, a.action_size), minval=-1.0, maxval=1.0
                )
                * r[None]
            )
        return tuple(acts)

    pol = policy if policy is not None else random_policy

    def one_step(carry, _):
        state, steps, key = carry
        key, k_pol, k_step = jax.random.split(key, 3)
        obs = tuple(scenario.observation(a, state) for a in agents)
        actions = pol(obs, k_pol)
        ks = jax.random.split(k_step, max(len(agents), 1))
        for i, a in enumerate(agents):
            state = env._decode_action(state, a, actions[i], ks[i])
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
        return (state, steps, key), (rews, done)

    def run(state, steps, key):
        (state, steps, key), (rews, dones) = jax.lax.scan(
            one_step, (state, steps, key), None, length=horizon
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
