"""Give-way behavioral test (reference tests/test_scenarios/test_give_way.py:24-45).

Scripted corridor maneuver: agent 0 hugs the bottom while crossing, agent 1
drives straight through; accumulated shaped reward must pass the reference's
success threshold (>17) in every env.
"""

import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env

MAX_STEPS = 600


def test_scripted_maneuver(n_envs=4):
    env = make_env("give_way", num_envs=n_envs, seed=0, mirror_passage=False)
    obs = env.reset(seed=0)
    u_range = float(env.agents[0].u_range_array[0])
    total_rew = np.zeros(n_envs)

    for _ in range(MAX_STEPS):
        if (np.asarray(obs[1])[:, :1] < 0).all():
            action_1 = jnp.tile(jnp.asarray([[u_range / 2, -u_range]]), (n_envs, 1))
        else:
            action_1 = jnp.tile(jnp.asarray([[u_range / 2, u_range]]), (n_envs, 1))
        action_2 = jnp.tile(jnp.asarray([[-u_range / 3, 0.0]]), (n_envs, 1))
        obs, rews, dones, _ = env.step([action_1, action_2])
        for rew in rews:
            total_rew += np.asarray(rew)
        if (total_rew > 17).all():
            break
    assert (total_rew > 17).all(), f"maneuver failed, total rewards {total_rew}"
