"""Dispersion behavioral tests (reference tests/test_scenarios/test_dispersion.py:33-110).

Greedy obs-derived policy (head to your food's relative position) must eat
all food; each done env's summed reward equals exactly n_agents (one food
reward per agent), in both per-agent and shared reward modes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

MAX_STEPS = 400


def _greedy_actions(obs, env, n_agents):
    actions = []
    idx = 0
    for i in range(n_agents):
        o = np.asarray(obs[i])
        u_range = float(env.agents[i].u_range_array[0])
        a = np.clip(o[:, 4 + idx : 6 + idx], -u_range, u_range)
        idx += 3
        actions.append(jnp.asarray(a))
    return actions


@pytest.mark.parametrize("share_reward", [False, True])
@pytest.mark.parametrize("n_agents", [1, 5])
def test_heuristic(n_agents, share_reward, n_envs=4):
    env = make_env(
        "dispersion", num_envs=n_envs, seed=0, n_agents=n_agents,
        share_reward=share_reward, penalise_by_time=False,
    )
    all_done = np.zeros(n_envs, bool)
    obs = env.reset(seed=0)
    total_rew = np.zeros((n_envs, n_agents))
    for _ in range(MAX_STEPS):
        obs, rews, dones, _ = env.step(_greedy_actions(obs, env, n_agents))
        for i in range(n_agents):
            total_rew[:, i] += np.asarray(rews[i])
        dones = np.asarray(dones)
        if dones.any():
            if share_reward:
                # every agent receives the shared total (dispersion.py:118-125)
                np.testing.assert_array_equal(
                    total_rew[dones].astype(np.int64),
                    np.full((dones.sum(), n_agents), n_agents),
                )
            else:
                np.testing.assert_array_equal(
                    total_rew[dones].sum(-1).astype(np.int64),
                    np.full(dones.sum(), n_agents),
                )
            total_rew[dones] = 0
            all_done |= dones
            for env_index in np.flatnonzero(dones):
                obs_r = env.reset_at(int(env_index))
                for i in range(n_agents):
                    obs[i] = obs_r[i]
        if all_done.all():
            break
    assert all_done.all(), f"not all envs finished in {MAX_STEPS} steps: {all_done}"
