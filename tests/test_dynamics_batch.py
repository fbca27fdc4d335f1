"""Batched process_action (Dynamics.process_action_batch) vs the
reference-shaped per-agent loop.

Two tiers (Environment._plan_process_action):

* ``batch_exact`` models (holonomic family / static / rotation) group BY
  DEFAULT — their batched form is pure slice/stack/scatter, so every leaf
  must match the ungrouped loop EXACTLY (zero tolerance).
* transcendental models (kinematic_bicycle, diff_drive, forward) group only
  under VMAS_TPU_BATCH_DYNAMICS=1: the math is element-for-element
  identical, but XLA may pick different FMA/SIMD contractions for the
  stacked shapes (tan/cos/sin in kinematic_bicycle measured 1 ulp off on
  CPU), so their contract is a TIGHT allclose — and that drift is why they
  are not a default (it compounds past golden-parity tolerance on
  road_traffic map 2 at horizon 50, for a measured ~7% win).
"""

import jax
import numpy as np
import pytest

from vmas_tpu import make_env

# ~1 ulp/step on O(1) values, 5 steps, plus slack for drift amplification
# through the contact chain
ATOL = 1e-5

# (name, kwargs, exact): exact=True cases exercise only batch_exact models
# (bitwise contract, grouped by default); exact=False cases include a
# transcendental model (ulp contract, opt-in grouping).
#   road_traffic: 20 KinematicBicycle         transport: 4 Holonomic
#   football (2 policy teams): HolonomicWithRotation agents + scripts
#   simple_speaker_listener: Static + Holonomic mix
CASES = [
    ("road_traffic", dict(n_agents=4, is_add_noise=False), False),
    ("transport", dict(n_agents=3), True),
    (
        "football",
        dict(n_blue_agents=2, n_red_agents=2, ai_red_agents=False, dense_reward=True),
        True,
    ),
    ("simple_speaker_listener", {}, True),
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


@pytest.mark.parametrize("name,kwargs,exact", CASES)
def test_batched_dynamics_matches_loop(monkeypatch, name, kwargs, exact):
    s_ref, obs_ref, rew_ref = _rollout(monkeypatch, "0", name, kwargs)
    s_bat, obs_bat, rew_bat = _rollout(monkeypatch, "1", name, kwargs)

    if exact:
        def check(a, b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        def check(a, b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=ATOL, rtol=0
            )

    for a, b in zip(jax.tree_util.tree_leaves(s_ref), jax.tree_util.tree_leaves(s_bat)):
        check(a, b)
    for oa, ob in zip(obs_ref, obs_bat):
        for a, b in zip(jax.tree_util.tree_leaves(oa), jax.tree_util.tree_leaves(ob)):
            check(a, b)
    for ra, rb in zip(rew_ref, rew_bat):
        for a, b in zip(jax.tree_util.tree_leaves(ra), jax.tree_util.tree_leaves(rb)):
            check(a, b)


def test_plan_default_groups_exact_models_only(monkeypatch):
    monkeypatch.delenv("VMAS_TPU_BATCH_DYNAMICS", raising=False)
    # transport: holonomic agents group by default
    env = make_env("transport", num_envs=2, seed=0, n_agents=3)
    singles, groups = env._plan_process_action()
    assert len(groups) == 1 and len(groups[0]) == 3
    assert singles == []
    # road_traffic: kinematic bicycles stay per-agent by default
    env = make_env("road_traffic", num_envs=2, seed=0, n_agents=4, is_add_noise=False)
    singles, groups = env._plan_process_action()
    assert groups == []
    assert len(singles) == 4


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
