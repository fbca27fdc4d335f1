"""Football behavioral test (reference tests/test_scenarios/test_football.py:30-64).

The scripted red-team AI plays against random blue agents with sparse
rewards; whenever an env finishes, the blue agents' summed reward must be
exactly -scoring_reward * n_agents (red scored, every blue agent got the
negative scoring reward and nothing else).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env

MAX_STEPS = 500


def test_ai_vs_random(n_envs=2, n_agents=3, scoring_reward=1):
    env = make_env(
        "football", num_envs=n_envs, seed=0,
        n_red_agents=n_agents, n_blue_agents=n_agents,
        ai_red_agents=True, ai_blue_agents=False,
        dense_reward=False, scoring_reward=scoring_reward,
    )
    obs = env.reset(seed=0)
    key = jax.random.PRNGKey(7)
    total_rew = np.zeros((n_envs, n_agents))
    n_done = 0

    for t in range(MAX_STEPS):
        key, k = jax.random.split(key)
        actions = [
            jax.random.uniform(jax.random.fold_in(k, i), (n_envs, 2))
            for i in range(n_agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        for i in range(n_agents):
            total_rew[:, i] += np.asarray(rews[i])
        dones = np.asarray(dones)
        if dones.any():
            np.testing.assert_array_equal(
                total_rew[dones].sum(-1).astype(np.int64),
                np.full(int(dones.sum()), -scoring_reward * n_agents),
            )
            total_rew[dones] = 0
            n_done += int(dones.sum())
            for env_index in np.flatnonzero(dones):
                obs_r = env.reset_at(int(env_index))
                for i in range(len(obs)):
                    obs[i] = obs_r[i]
        if n_done >= n_envs:
            break
    assert n_done >= 1, "scripted AI never scored against random agents"
