"""Reverse-transport behavioral test
(reference tests/test_scenarios/test_reverse_transport.py:30-53).

Agents inside the hollow box push opposite the package->goal offset (the last
two obs dims are the package-relative goal), delivering in every env.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

MAX_STEPS = 2000


@pytest.mark.parametrize("n_agents", [5])
def test_heuristic(n_agents, n_envs=4):
    env = make_env("reverse_transport", num_envs=n_envs, seed=0, n_agents=n_agents)
    obs = env.reset(seed=0)
    all_done = np.zeros(n_envs, bool)

    for _ in range(MAX_STEPS):
        actions = []
        for i in range(n_agents):
            o = np.asarray(obs[i])
            u_range = float(env.agents[i].u_range_array[0])
            actions.append(jnp.asarray(np.clip(-o[:, -2:], -u_range, u_range)))
        obs, rews, dones, _ = env.step(actions)
        dones = np.asarray(dones)
        if dones.any():
            all_done |= dones
            for env_index in np.flatnonzero(dones):
                obs_r = env.reset_at(int(env_index))
                for i in range(n_agents):
                    obs[i] = obs_r[i]
        if all_done.all():
            break
    assert all_done.all(), f"reverse transport incomplete: {all_done}"
