"""Navigation behavioral test (reference tests/test_scenarios/test_navigation.py:25-57).

The CLF-QP heuristic (exact jax solve of the reference's cvxpylayers QP)
must drive every env to done (all agents on their goals), with per-env
resets along the way. Same clf_epsilon=0.4 as the reference test; the
reference runs unbounded, we cap at MAX_STEPS (the QP's min-norm control
decays exponentially, all envs finish by ~300 steps).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.navigation import HeuristicPolicy

MAX_STEPS = 600


@pytest.mark.parametrize("n_agents", [1])
def test_heuristic(n_agents, n_envs=5):
    env = make_env("navigation", num_envs=n_envs, seed=0, n_agents=n_agents)
    policy = HeuristicPolicy(True, clf_epsilon=0.4, clf_slack=100.0)
    obs = env.reset(seed=0)
    all_done = np.zeros(n_envs, bool)

    for _ in range(MAX_STEPS):
        actions = [
            policy.compute_action(jnp.asarray(o), float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        dones = np.asarray(dones)
        if dones.any():
            all_done |= dones
            for env_index in np.flatnonzero(dones):
                obs_r = env.reset_at(int(env_index))
                for i in range(len(obs)):
                    obs[i] = obs_r[i]
        if all_done.all():
            break
    assert all_done.all(), f"navigation heuristic failed to finish: {all_done}"
