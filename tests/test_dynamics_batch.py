"""Batched process_action (Dynamics.process_action_batch) matches the
reference-shaped per-agent loop to ~1 ulp per step.

The opt-in VMAS_TPU_BATCH_DYNAMICS=1 groups same-batch_spec agents at build
time (Environment._plan_process_action) and runs one [B, A] computation per
group. The math is element-for-element identical, but XLA may pick different
FMA/SIMD contractions for the stacked shapes of the transcendental models
(tan/cos/sin in kinematic_bicycle measured 1 ulp off on CPU), so the
contract is a TIGHT allclose over a short rollout, not bitwise — which is
also why the knob defaults OFF (the drift compounds past golden-parity
tolerance on road_traffic map 2 at horizon 50, for a measured ~7% win).
"""

import jax
import numpy as np
import pytest

from vmas_tpu import make_env

# ~1 ulp/step on O(1) values, 5 steps, plus slack for drift amplification
# through the contact chain
ATOL = 1e-5

# scenarios exercising each batchable model with >= 2 same-spec agents:
#   road_traffic: 20 KinematicBicycle         transport: 4 Holonomic
#   football (2 policy teams): HolonomicWithRotation ball/agents + scripts
#   simple_speaker_listener: Static + Holonomic mix
CASES = [
    ("road_traffic", dict(n_agents=4, is_add_noise=False)),
    ("transport", dict(n_agents=3)),
    (
        "football",
        dict(n_blue_agents=2, n_red_agents=2, ai_red_agents=False, dense_reward=True),
    ),
    ("simple_speaker_listener", {}),
]


def _rollout(monkeypatch, flag, name, kwargs, steps=5):
    monkeypatch.setenv("VMAS_TPU_BATCH_DYNAMICS", flag)
    env = make_env(name, num_envs=4, seed=7, **kwargs)
    obs_all, rew_all = [], []
    for _ in range(steps):
        acts = env.get_random_actions()
        obs, rews, dones, infos = env.step(acts)
        obs_all.append(obs)
        rew_all.append(rews)
    return env.state, obs_all, rew_all


@pytest.mark.parametrize("name,kwargs", CASES)
def test_batched_dynamics_matches_loop(monkeypatch, name, kwargs):
    s_ref, obs_ref, rew_ref = _rollout(monkeypatch, "0", name, kwargs)
    s_bat, obs_bat, rew_bat = _rollout(monkeypatch, "1", name, kwargs)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_bat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL, rtol=0)
    for oa, ob in zip(obs_ref, obs_bat):
        for a, b in zip(jax.tree_util.tree_leaves(oa), jax.tree_util.tree_leaves(ob)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL, rtol=0)
    for ra, rb in zip(rew_ref, rew_bat):
        for a, b in zip(jax.tree_util.tree_leaves(ra), jax.tree_util.tree_leaves(rb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL, rtol=0)


def test_plan_groups_road_traffic(monkeypatch):
    monkeypatch.setenv("VMAS_TPU_BATCH_DYNAMICS", "1")
    env = make_env("road_traffic", num_envs=2, seed=0, n_agents=4, is_add_noise=False)
    singles, groups = env._plan_process_action()
    assert len(groups) == 1 and len(groups[0]) == 4
    assert singles == []


def test_plan_respects_scenario_process_action(monkeypatch):
    # give_way's scenario overrides process_action (PID controller) — the
    # plan must keep EVERY agent on the per-agent hook path
    monkeypatch.setenv("VMAS_TPU_BATCH_DYNAMICS", "1")
    env = make_env("give_way", num_envs=2, seed=0)
    singles, groups = env._plan_process_action()
    assert groups == []
    assert len(singles) == len(env.world.agents)
