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


def test_passing_policy_and_shoot_surface():
    """passing_policy / shoot / dribble_to_goal are callable AgentPolicy API
    (reference football.py:1817-1833, 1893-1918, 1863-1864 — shipped even
    though run() only uses dribble_policy). shot_power must be re-armed from
    -1 on every call and only enter (0, 1] where the geometric gates hold."""
    env = make_env(
        "football", num_envs=4, seed=0,
        n_red_agents=2, n_blue_agents=2,
        ai_red_agents=True, ai_blue_agents=False,
    )
    env.reset(seed=0)
    pol = env.scenario.red_controller
    state = env.state
    ai = dict(state.scenario[pol.key])
    agent = pol.teammates[0]

    ai = pol.check_possession(state, ai)
    ai2 = pol.passing_policy(state, ai, agent)
    i = pol.slot_in_team(agent)
    sp = np.asarray(ai2["shot_power"][:, i])
    assert (((sp == -1.0) | ((sp > 0.0) & (sp <= 1.0)))).all()
    # passing_policy targets the teammate through shoot(): the armed target
    # angle points from the agent to its teammate for possession envs
    other = pol.teammates[1]
    disp = np.asarray(other.pos(state) - agent.pos(state))
    expect_ang = np.arctan2(disp[:, 1], disp[:, 0])
    poss = np.asarray(ai["agent_possession"][:, i])
    got_ang = np.asarray(ai2["target_ang"][:, i])
    np.testing.assert_allclose(got_ang[poss], expect_ang[poss], atol=1e-5)

    # shoot with an all-true mask arms every lane's target_ang
    ai3 = pol.shoot(state, dict(ai), agent, other.pos(state),
                    mask=jnp.ones(4, bool))
    np.testing.assert_allclose(
        np.asarray(ai3["target_ang"][:, i]), expect_ang, atol=1e-5
    )
    # far-from-ball lanes stay disarmed
    far = np.asarray(
        jnp.linalg.norm(env.scenario.ball.pos(state) - agent.pos(state), axis=-1)
    ) > pol.shooting_radius
    assert (np.asarray(ai3["shot_power"][:, i])[far] == -1.0).all()

    # dribble_to_goal writes objectives toward the target net
    ai4 = pol.dribble_to_goal(state, dict(ai), agent, mask=jnp.ones(4, bool))
    assert np.isfinite(np.asarray(ai4["target_pos"][:, i])).all()

    # disable/enable flip the run() kill switch
    pol.disable()
    assert pol.disabled
    pol.enable()
    assert not pol.disabled
