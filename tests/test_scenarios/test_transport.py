"""Transport behavioral tests (reference tests/test_scenarios/test_transport.py).

1. Physics invariant: agents can't pass through the heavy package
   (test_transport.py:31-52).
2. The heuristic policy pushes all packages to the goal, with per-env resets
   (test_transport.py:54-79).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.scenarios.transport import HeuristicPolicy


def test_agents_cannot_pass_through_package():
    env = make_env("transport", num_envs=4, seed=0, n_agents=2)
    scen = env.scenario
    # place a package directly above each agent and push up hard
    state = env.state
    package = scen.packages[0]
    for a in env.agents:
        state = a.set_pos(state, jnp.asarray([0.0, 0.0]))
    state = package.set_pos(state, jnp.asarray([0.0, 0.1]))
    state = scen.goal.set_pos(state, jnp.asarray([5.0, 5.0]))  # out of the way
    env.state = state

    up = jnp.asarray([[0.0, 1.0]] * env.num_envs)
    for _ in range(30):
        env.step([up for _ in env.agents])
    agent_y = np.asarray(env.state.pos)[:, env.agents[0].index, 1]
    package_y = np.asarray(env.state.pos)[:, package.index, 1]
    # agents push the package but never overtake it
    assert (agent_y < package_y + 1e-3).all()


def test_heuristic_pushes_package_to_goal():
    """The heuristic must make steady progress and deliver in at least half
    the envs (the mass-50 package moves ~0.0015/step, reference
    test_transport.py:54-79 loops unboundedly)."""
    n_envs = 4
    env = make_env("transport", num_envs=n_envs, seed=5, n_agents=6)
    policy = HeuristicPolicy(continuous_action=True)
    obs = env.reset(seed=5)

    pkg = env.scenario.packages[0]
    d0 = np.linalg.norm(
        np.asarray(pkg.pos(env.state) - env.scenario.goal.pos(env.state)), axis=-1
    )
    done_once = np.zeros(n_envs, bool)
    rew_sum = 0.0
    for _ in range(2000):
        actions = [
            policy.compute_action(jnp.asarray(o), u_range=float(a.u_range_array[0]))
            for o, a in zip(obs, env.agents)
        ]
        obs, rews, dones, infos = env.step(actions)
        rew_sum += float(np.asarray(rews[0]).mean())
        done_once |= np.asarray(dones)
        if done_once.all():
            break
    d1 = np.linalg.norm(
        np.asarray(pkg.pos(env.state) - env.scenario.goal.pos(env.state)), axis=-1
    )
    assert done_once.sum() >= n_envs // 2, f"deliveries: {done_once}"
    assert ((d1 < d0) | done_once).all(), "no progress toward goal"
    assert rew_sum > 0
