"""road_traffic map-2 challenging initial-state buffer semantics.

The reference records, for each colliding env, the state from
``n_steps_stored`` steps BEFORE the collision (the lead-up), pulled from a
per-step StateBuffer of capacity ``n_steps_before_recording``
(reference done(), road_traffic.py:2296-2306; CircularBuffer.get_latest,
road_traffic.py:3023-3037: falls back to slot 0 — the post-reset seed —
while fewer than n steps have elapsed since the last reset).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vmas_tpu import make_env


@pytest.fixture(scope="module")
def env():
    return make_env(
        "road_traffic",
        num_envs=2,
        seed=0,
        map_type="2",
        n_agents=4,
        probability_record=1.0,
        is_add_noise=False,
    )


def _force_record(env):
    """Set every collision flag and run the ISB recorder on the current
    state, returning (buffer, size)."""
    scen = env.scenario
    s = dict(env.state.scenario)
    s["coll_agents"] = jnp.ones_like(s["coll_agents"])
    st = scen._isb_record(env.state.replace(scenario=s))
    return np.asarray(st.scenario["isb_buffer"]), int(st.scenario["isb_size"])


def test_isb_records_leadup_not_collision_state(env):
    scen = env.scenario
    seed_entry = np.asarray(env.state.scenario["hist"][:, 0]).copy()

    entries = []
    for _ in range(3):
        env.step(env.get_random_actions())
        entries.append(
            np.asarray(scen._hist_entry(env.state, dict(env.state.scenario)))
        )
    assert int(env.state.scenario["hist_valid"][0]) == 4  # seed + 3 pushes

    # real collisions during the steps above may already have recorded
    # entries (probability_record=1) — index relative to the current size
    size0 = int(env.state.scenario["isb_size"])
    cap = scen.isb_capacity
    buf, size = _force_record(env)
    assert size == size0 + 2  # both envs recorded (probability_record=1)
    # fewer than n_steps_stored steps since reset -> the recorded lead-up is
    # the reset-time seed (CircularBuffer.get_latest n>valid_size fallback)
    np.testing.assert_array_equal(buf[size0 % cap], seed_entry[0])
    np.testing.assert_array_equal(buf[(size0 + 1) % cap], seed_entry[1])
    # ... and NOT the collision-time state
    assert not np.array_equal(buf[size0 % cap], entries[-1][0])


def test_isb_edge_ring_sizes():
    """n_steps_before_recording=1: the pointer wraps on the 1-slot ring and
    the lead-up is simply the latest state (get_latest falls back to slot 0,
    which the every-step push keeps current). buffer_size=1: when more envs
    record than the ISB holds, the LAST env's entry wins deterministically
    (the reference adds sequentially in env order)."""
    env2 = make_env(
        "road_traffic",
        num_envs=2,
        seed=0,
        map_type="2",
        n_agents=4,
        probability_record=1.0,
        is_add_noise=False,
        n_steps_before_recording=1,
        buffer_size=1,
    )
    scen = env2.scenario
    for _ in range(2):
        env2.step(env2.get_random_actions())
    assert int(env2.state.scenario["hist_ptr"][0]) == 0  # wrapped, not OOB
    latest = np.asarray(scen._hist_entry(env2.state, dict(env2.state.scenario)))
    buf, _ = _force_record(env2)
    np.testing.assert_array_equal(buf[0], latest[1])


def test_isb_records_n_steps_stored_ago(env):
    scen = env.scenario
    n = scen.n_steps_stored
    env.reset(seed=1)
    entries = []
    for _ in range(n + 2):
        env.step(env.get_random_actions())
        entries.append(
            np.asarray(scen._hist_entry(env.state, dict(env.state.scenario)))
        )
    assert int(env.state.scenario["hist_valid"][0]) == scen.n_steps_before_recording

    size0 = int(env.state.scenario["isb_size"])
    cap = scen.isb_capacity
    buf, size = _force_record(env)
    assert size == size0 + 2
    # latest push is entries[-1] (n=1); get_latest(n) -> entries[-n]
    np.testing.assert_array_equal(buf[size0 % cap], entries[-n][0])
    np.testing.assert_array_equal(buf[(size0 + 1) % cap], entries[-n][1])


def test_pallas_sweep_kernel_matches_xla_path():
    """The fused pallas sweep kernel (road_traffic_kernel.sweep_all, the
    default) must reproduce the XLA helpers' step outputs: identical
    segment indices / collision flags, distances to float tolerance (the
    kernel reorders fma contractions; observed diffs are ulp-level)."""
    kw = dict(num_envs=4, seed=0, n_agents=4, is_add_noise=False)
    env_k = make_env("road_traffic", pallas_sweeps=True, **kw)
    env_x = make_env("road_traffic", pallas_sweeps=False, **kw)
    assert env_k.scenario.pallas_sweeps  # kernel path actually on
    for step in range(3):
        acts = env_k.get_random_actions()
        obs_k, rew_k, done_k, _ = env_k.step(acts)
        obs_x, rew_x, done_x, _ = env_x.step(acts)
        sk, sx = env_k.state.scenario, env_x.state.scenario
        np.testing.assert_array_equal(sk["idx_ref"], sx["idx_ref"], err_msg=f"step {step}")
        np.testing.assert_array_equal(sk["idx_left"], sx["idx_left"])
        np.testing.assert_array_equal(sk["idx_right"], sx["idx_right"])
        np.testing.assert_array_equal(sk["coll_lanelets"], sx["coll_lanelets"])
        np.testing.assert_allclose(sk["short_term"], sx["short_term"], atol=1e-5)
        for ok, ox in zip(obs_k, obs_x):
            np.testing.assert_allclose(ok, ox, atol=5e-5)
        np.testing.assert_allclose(rew_k, rew_x, atol=5e-5)
        np.testing.assert_array_equal(done_k, done_x)


def test_pallas_sweeps_disabled_under_grad():
    """grad_enabled flips the forward-only kernel off (environment.py)."""
    env = make_env(
        "road_traffic", num_envs=2, seed=0, n_agents=4, grad_enabled=True,
    )
    assert env.scenario.pallas_sweeps is False


def test_pallas_obs_kernel_matches_xla_path():
    """The all-ego pallas observation kernel (road_traffic_kernel.obs_all,
    opt-in via pallas_obs=True) must reproduce the per-agent observation
    hook: same top-K nearing selection and masking, values to float
    tolerance. Noise is on for one env pair (same obs_key -> identical
    noise) and off for the strict comparison."""
    for noise, extra in ((False, {}), (True, {}),
                         (False, dict(n_nearing_agents_observed=3))):
        kw = dict(num_envs=4, seed=0, n_agents=4, is_add_noise=noise, **extra)
        env_k = make_env("road_traffic", pallas_obs=True, **kw)
        env_x = make_env("road_traffic", **kw)
        assert env_k.scenario.pallas_obs  # kernel path actually on
        for step in range(3):
            acts = env_k.get_random_actions()
            env_x.get_random_actions()  # keep the obs-noise key streams in sync
            obs_k, rew_k, done_k, _ = env_k.step(acts)
            obs_x, rew_x, done_x, _ = env_x.step(acts)
            for ok, ox in zip(obs_k, obs_x):
                np.testing.assert_allclose(
                    ok, ox, atol=5e-5, err_msg=f"noise={noise} step {step}"
                )
            np.testing.assert_allclose(rew_k, rew_x, atol=5e-5)
            np.testing.assert_array_equal(done_k, done_x)


def test_pallas_obs_reset_path_and_grad_gating():
    """obs kernel also serves the reset-path observations; grad_enabled
    flips it off; non-default obs structure falls back to the XLA hook."""
    env = make_env(
        "road_traffic", num_envs=2, seed=0, n_agents=4, grad_enabled=True,
        pallas_obs=True,
    )
    assert env.scenario.pallas_obs is False
    env = make_env(
        "road_traffic", num_envs=2, seed=0, n_agents=4, pallas_obs=True,
        is_observe_vertices=False,
    )
    assert env.scenario.observations(env.state) is None
    obs, *_ = env.reset()
    assert np.isfinite(np.asarray(obs[0])).all()


def test_pallas_obs_composes_with_env_sharding():
    """The obs kernel's grid blocks the flattened (env, agent) lane axis, so
    pjit partitions it per env shard like the physics kernel."""
    from vmas_tpu.parallel import distribute

    env = make_env(
        "road_traffic", num_envs=16, seed=0, n_agents=4, pallas_obs=True,
    )
    distribute(env)
    for _ in range(2):
        obs, rews, dones, infos = env.step(env.get_random_actions())
    assert np.isfinite(np.asarray(obs[0])).all()
    assert "env" in str(env.state.pos.sharding)
