"""Balance behavioral test (reference tests/test_scenarios/test_balance.py:31-60).

The heuristic must move the package monotonically toward the goal while the
line stays balanced against gravity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.balance import HeuristicPolicy


@pytest.mark.parametrize("n_agents", [2, 5])
def test_heuristic(n_agents, n_steps=50, n_envs=4):
    env = make_env(
        "balance", num_envs=n_envs, seed=0, n_agents=n_agents,
        random_package_pos_on_line=False,
    )
    policy = HeuristicPolicy(True)
    obs = env.reset(seed=0)

    prev = np.linalg.norm(np.asarray(obs[0])[:, 8:10], axis=-1)
    for _ in range(n_steps):
        actions = [
            policy.compute_action(jnp.asarray(o), float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, _ = env.step(actions)
        cur = np.linalg.norm(np.asarray(obs[0])[:, 8:10], axis=-1)
        assert (cur <= prev + 1e-6).all(), "package moved away from goal"
        prev = cur
