"""Passage behavioral test (reference tests/test_scenarios/test_passage.py:29-67).

Two-phase scripted policy: head to the passage, then to the goal; every env
must reach done (all agents through the wall onto their goals).
"""

import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env

MAX_STEPS = 500


def test_scripted_two_phase(n_envs=4):
    env = make_env("passage", num_envs=n_envs, seed=0, n_passages=1, shared_reward=True)
    n_agents = len(env.agents)
    obs = env.reset(seed=0)
    switched = np.zeros((n_agents, n_envs), bool)
    all_done = np.zeros(n_envs, bool)

    for _ in range(MAX_STEPS):
        actions = []
        for i in range(n_agents):
            o = np.asarray(obs[i])
            u_range = float(env.agents[i].u_range_array[0])
            to_passage = o[:, 6:8]
            to_goal = o[:, 4:6]
            switched[i] |= np.linalg.norm(to_passage, axis=1) <= 0.025
            act = np.clip(2 * to_passage, -u_range, u_range)
            act[switched[i]] = np.clip(2 * to_goal, -u_range, u_range)[switched[i]]
            actions.append(jnp.asarray(act))
        obs, rews, dones, _ = env.step(actions)
        dones = np.asarray(dones)
        if dones.any():
            all_done |= dones
            for env_index in np.flatnonzero(dones):
                switched[:, env_index] = False
                obs_r = env.reset_at(int(env_index))
                for i in range(n_agents):
                    obs[i] = obs_r[i]
        if all_done.all():
            break
    assert all_done.all(), f"passage maneuver incomplete: {all_done}"
