"""Dropout behavioral tests (reference tests/test_scenarios/test_dropout.py:36-100).

One agent heading straight for the food can always finish the task alone;
rewards are shared identically across agents and positive on done envs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

MAX_STEPS = 300


def _greedy(obs_agent, u_range):
    o = np.asarray(obs_agent)
    return jnp.asarray(np.clip(o[:, -3:-1], -u_range, u_range))


@pytest.mark.parametrize("n_agents", [1, 5])
def test_best_agent_reaches_food(n_agents, n_envs=4):
    env = make_env("dropout", num_envs=n_envs, seed=0, n_agents=n_agents)
    obs = env.reset(seed=0)
    total_rew = np.zeros(n_envs)

    # the agent closest to the food (in env 0) does the work, others idle
    dists = [np.linalg.norm(np.asarray(o)[0, -3:-1]) for o in obs]
    best_i = int(np.argmin(dists))
    zeros = jnp.zeros((n_envs, 2))

    for _ in range(MAX_STEPS):
        u_range = float(env.agents[best_i].u_range_array[0])
        actions = [
            _greedy(obs[j], u_range) if j == best_i else zeros
            for j in range(n_agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        r0 = np.asarray(rews[0])
        for j in range(n_agents):
            np.testing.assert_array_equal(r0, np.asarray(rews[j]))
        total_rew += r0
        dones = np.asarray(dones)
        assert (total_rew[dones] > 0).all(), "done env finished with non-positive reward"
        if dones.any():
            break
    assert dones.any(), "greedy agent never reached the food"
