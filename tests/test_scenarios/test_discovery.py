"""Discovery behavioral test (reference tests/test_scenarios/test_discovery.py:25-45,
which smoke-runs the heuristic; we additionally assert targets get covered)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.discovery import HeuristicPolicy


@pytest.mark.parametrize("agent_lidar", [True, False])
@pytest.mark.parametrize("n_agents", [4])
def test_heuristic(n_agents, agent_lidar, n_steps=100, n_envs=4):
    env = make_env(
        "discovery", num_envs=n_envs, seed=0, n_agents=n_agents,
        use_agent_lidar=agent_lidar,
    )
    policy = HeuristicPolicy(True)
    obs = env.reset(seed=0)

    covered = 0.0
    for _ in range(n_steps):
        actions = [
            policy.compute_action(jnp.asarray(o), float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, infos = env.step(actions)
        covered += float(np.asarray(infos[0]["targets_covered"]).sum())
    assert covered > 0, "heuristic never covered a target"
