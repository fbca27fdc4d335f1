"""Waterfall behavioral test (reference tests/test_scenarios/test_waterfall.py:24-37).

Goal-seeking greedy policy runs 50 steps through the joint-linked obstacle
course; rewards/obs stay finite and agents make net downward-goal progress.
"""

import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env


def test_heuristic(n_agents=5, n_envs=4, n_steps=50):
    env = make_env("waterfall", num_envs=n_envs, seed=0, n_agents=n_agents)
    obs = env.reset(seed=0)
    d0 = np.linalg.norm(np.asarray(obs[0])[:, -2:], axis=-1)
    for _ in range(n_steps):
        actions = []
        for i in range(n_agents):
            o = np.asarray(obs[i])
            u_range = float(env.agents[i].u_range_array[0])
            actions.append(jnp.asarray(np.clip(o[:, -2:], -u_range, u_range)))
        obs, rews, dones, _ = env.step(actions)
        assert all(np.isfinite(np.asarray(r)).all() for r in rews)
    d1 = np.linalg.norm(np.asarray(obs[0])[:, -2:], axis=-1)
    assert (d1 < d0).all(), f"no goal progress: {d0} -> {d1}"
