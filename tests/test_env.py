"""Cross-scenario environment API tests.

Mirrors the reference's test matrix (reference tests/test_vmas.py):
continuous/discrete stepping, multidiscrete actions, discrete->control
mapping exactness, Discrete==MultiDiscrete equivalence, partial reset,
mid-rollout global reset, seeding isolation, differentiability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

SCENARIOS = ["dispersion", "transport"]


def step_n(env, n=3):
    out = None
    for _ in range(n):
        out = env.step(env.get_random_actions())
    return out


@pytest.mark.parametrize("scenario", SCENARIOS)
@pytest.mark.parametrize("continuous", [True, False])
def test_use_env(scenario, continuous):
    env = make_env(scenario, num_envs=4, seed=0, continuous_actions=continuous)
    obs, rews, dones, infos = step_n(env, 3)
    assert len(obs) == env.n_agents
    for o, r in zip(obs, rews):
        assert o.shape[0] == 4
        assert r.shape == (4,)
    assert np.asarray(dones).shape == (4,)
    assert np.isfinite(np.asarray(obs[0])).all()


def test_multidiscrete_actions():
    env = make_env("dispersion", num_envs=4, seed=0, continuous_actions=False, multidiscrete_actions=True)
    obs, rews, dones, infos = step_n(env, 3)
    assert np.isfinite(np.asarray(obs[0])).all()


def test_discrete_action_nvec_mapping():
    """Discrete action j maps exactly to the reference's control value
    (environment.py:683-707), including the odd-n zero remap."""
    from vmas_tpu.core import Agent, Sphere, World
    from vmas_tpu.scenario import BaseScenario

    class S(BaseScenario):
        def make_world(self, batch_dim, device=None, **kwargs):
            w = World(batch_dim, device)
            w.add_agent(Agent("a", shape=Sphere(0.05), u_range=1.0, discrete_action_nvec=[5, 4]))
            return w

        def reset_world_at(self, state, key):
            return state

        def observation(self, agent, state):
            return agent.pos(state)

        def reward(self, agent, state):
            return jnp.zeros(state.batch_dim)

    env = make_env(S(), num_envs=1, seed=0, continuous_actions=False, multidiscrete_actions=True)
    agent = env.agents[0]
    # n=5 (odd): [0,1,2,3,4] -> [0, -1, -0.5, 0.5, 1]
    expect5 = {0: 0.0, 1: -1.0, 2: -0.5, 3: 0.5, 4: 1.0}
    # n=4 (even): [0..3] -> [-1, -1/3, 1/3, 1]
    expect4 = {0: -1.0, 1: -1 / 3, 2: 1 / 3, 3: 1.0}
    for a5, u5 in expect5.items():
        for a4, u4 in expect4.items():
            env.step([jnp.asarray([[a5, a4]])])
            u = np.asarray(agent.u(env.state))[0]
            np.testing.assert_allclose(u, [u5, u4], atol=1e-6)


def test_discrete_multidiscrete_equivalence():
    """Flat Discrete decode == MultiDiscrete (reference test_vmas.py:157-232)."""
    import math

    nvec = [3, 4]
    envs = {}
    for md in [True, False]:
        from vmas_tpu.core import Agent, Sphere, World
        from vmas_tpu.scenario import BaseScenario

        class S(BaseScenario):
            def make_world(self, batch_dim, device=None, **kwargs):
                w = World(batch_dim, device)
                w.add_agent(Agent("a", shape=Sphere(0.05), discrete_action_nvec=nvec))
                return w

            def reset_world_at(self, state, key):
                return state

            def observation(self, agent, state):
                return agent.pos(state)

            def reward(self, agent, state):
                return jnp.zeros(state.batch_dim)

        envs[md] = make_env(S(), num_envs=1, seed=0, continuous_actions=False, multidiscrete_actions=md)

    for flat in range(math.prod(nvec)):
        md_action = [flat // nvec[1], flat % nvec[1]]
        envs[True].step([jnp.asarray([md_action])])
        envs[False].step([jnp.asarray([[flat]])])
        u_md = np.asarray(envs[True].agents[0].u(envs[True].state))
        u_flat = np.asarray(envs[False].agents[0].u(envs[False].state))
        np.testing.assert_allclose(u_md, u_flat, atol=1e-6, err_msg=f"flat={flat}")


@pytest.mark.parametrize("scenario", SCENARIOS)
def test_partial_reset(scenario):
    env = make_env(scenario, num_envs=4, seed=0)
    step_n(env, 2)
    before = np.asarray(env.state.pos).copy()
    env.reset_at(1)
    after = np.asarray(env.state.pos)
    # env 1 re-randomized, others untouched
    assert not np.allclose(before[1], after[1])
    np.testing.assert_array_equal(before[0], after[0])
    np.testing.assert_array_equal(before[2], after[2])
    assert int(env.steps[1]) == 0 and int(env.steps[0]) == 2


def test_global_reset_mid_rollout():
    env = make_env("dispersion", num_envs=3, seed=0)
    step_n(env, 2)
    obs = env.reset()
    assert int(env.steps[0]) == 0
    assert np.isfinite(np.asarray(obs[0])).all()


def test_seeding():
    """Same seed => same reset obs and same rollouts; user RNG untouched
    (reference test_vmas.py:307-322 / local_seed)."""
    env = make_env("transport", num_envs=2, seed=5)
    o1 = env.reset(seed=5)
    env2 = make_env("transport", num_envs=2, seed=5)
    o2 = env2.reset(seed=5)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))

    a = [jnp.zeros((2, 2)) for _ in range(env.n_agents)]
    r1 = env.step(a)[0]
    r2 = env2.step(a)[0]
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))


def test_max_steps_truncation():
    env = make_env("transport", num_envs=2, seed=0, max_steps=3)
    for _ in range(2):
        _, _, dones, _ = step_n(env, 1)
    assert not np.asarray(dones).any()
    _, _, dones, _ = step_n(env, 1)
    assert np.asarray(dones).all()


def test_terminated_truncated():
    env = make_env("transport", num_envs=2, seed=0, max_steps=2, terminated_truncated=True)
    obs, rews, term, trunc, infos = step_n(env, 2)
    assert np.asarray(trunc).all()
    assert np.asarray(term).dtype == bool


def test_dict_spaces():
    env = make_env("dispersion", num_envs=2, seed=0, dict_spaces=True)
    obs, rews, dones, infos = step_n(env, 1)
    assert set(obs.keys()) == {a.name for a in env.agents}
    assert set(rews.keys()) == {a.name for a in env.agents}


def test_differentiable_rollout():
    """Gradients flow from rollout outputs back to actions
    (reference test_vmas_differentiable, tests/test_vmas.py:277-304)."""
    env = make_env("transport", num_envs=2, seed=0)
    state0 = env.state
    scenario, world = env.scenario, env.world

    def loss(u0):
        state = state0
        for a, u in zip(env.agents, [u0] * len(env.agents)):
            state = a.set_u(state, u)
        for a in world.agents:
            state = scenario.env_process_action(a, state)
        state = world.step(state)
        state = scenario.pre_rewards(state)
        rew = scenario.reward(env.agents[0], state)
        obs = scenario.observation(env.agents[0], state)
        return jnp.mean(obs) + jnp.mean(rew)

    g = jax.grad(loss)(jnp.full((2, 2), 0.1))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_observations_batch_hook_overrides_per_agent():
    """BaseScenario.observations (batch hook) replaces the per-agent
    observation calls when it returns a tuple, and falls back on None."""
    import jax.numpy as jnp

    from vmas_tpu.scenarios.transport import Scenario as TransportScenario

    calls = {"batch": 0}

    class BatchObsScenario(TransportScenario):
        def observations(self, state):
            calls["batch"] += 1
            return tuple(
                self.observation(a, state) + 1.0
                for a in self.world.policy_agents
            )

    env = make_env(BatchObsScenario(), num_envs=3, seed=0, n_agents=2)
    obs, *_ = env.reset()
    ref = make_env("transport", num_envs=3, seed=0, n_agents=2)
    obs_ref, *_ = ref.reset()
    assert calls["batch"] >= 1
    np.testing.assert_allclose(
        np.asarray(obs[0]), np.asarray(obs_ref[0]) + 1.0, atol=0
    )
