"""Wheel behavioral test (reference tests/test_scenarios/test_wheel.py:32-52,
which only smoke-runs the heuristic; we additionally assert the objective:
the line's |angular velocity| converges toward desired_velocity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.wheel import HeuristicPolicy


@pytest.mark.parametrize("n_agents", [2, 10])
def test_heuristic(n_agents, n_steps=100, n_envs=4):
    desired_velocity = 0.1
    env = make_env(
        "wheel", num_envs=n_envs, seed=0, n_agents=n_agents,
        line_length=2, desired_velocity=desired_velocity,
    )
    policy = HeuristicPolicy(True)
    obs = env.reset(seed=0)

    for _ in range(n_steps):
        actions = [
            policy.compute_action(jnp.asarray(o), float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, _ = env.step(actions)

    # the line (mass 30) must be spinning toward desired_velocity on average;
    # with few agents progress per env is slow, so assert mean improvement
    ang_vel = np.abs(np.asarray(env.scenario.line.ang_vel(env.state))).reshape(-1)
    err0 = desired_velocity  # starts at rest: initial error == target
    assert (ang_vel > 0).any(), "line never moved"
    assert np.abs(ang_vel - desired_velocity).mean() < err0, (
        f"no mean progress toward desired angular velocity: {ang_vel}"
    )
