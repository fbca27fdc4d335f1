"""Fused pallas physics step vs the XLA path (vmas_tpu/core/fused.py).

Runs both paths from identical randomized states on scenarios covering every
shape-pair kernel, and asserts near-bitwise agreement over multi-step
rollouts. On CPU the pallas kernel executes in interpret mode — same math,
same unrolled program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env

# case -> pair kernels it exercises (unrolled branches at few pairs,
# lane-batched tile branches at >= _LANE_MIN pairs)
CASES = {
    "dispersion": "ss (agents)",
    "transport": "ss + box-sphere (movable box, clamps)",
    "balance": "line-sphere + box walls + gravity",
    "wheel": "line torque dynamics",
    "reverse_transport": "box-sphere non-hollow + box-box",
    "passage": "box landmarks + ss",
    "kinematic_bicycle": "box-box contact, substeps=10",
    "pollock": "unrolled ll/bb + batched ls/bs/bl soup",
    "pollock_dense": "ALL SIX lane-batched tile branches (ll 15, bb 15)",
    "wind_flocking": "per-env dynamic gravity + linear friction",
}
KWARGS = {
    "pollock": dict(n_agents=4, n_lines=4, n_boxes=4),
    # 6 lines / 6 boxes push ll (15) and bb (15) over _LANE_MIN: every
    # shape-pair type runs its lane-batched tile branch. Counter-intuitively
    # CHEAP in interpret mode — each batched type is a handful of big vector
    # ops, where the 4/4/4 config's UNROLLED ll/bb chains cost minutes.
    "pollock_dense": dict(n_agents=4, n_lines=6, n_boxes=6),
    "transport": dict(n_agents=3),
}
SCENARIO_OF = {"pollock_dense": "pollock"}

# rollout steps per case: interpret-mode pallas on the 1-vCPU CI host costs
# minutes per execution for the largest unrolled programs (substeps x pairs),
# so the heavy cases verify one genuine kernel execution instead of five
STEPS = {"kinematic_bicycle": 1, "pollock": 1, "pollock_dense": 2,
         "wind_flocking": 2}
# pollock's unrolled ll/bb candidate chains make interpret mode exceed 400 s
# even for one step; its fused parity runs on the chip instead
# (tests/golden/bench_fused_v2.py: max err 3.8e-5 over 4 steps)
CPU_SKIP = {"pollock"}


def _randomized(env, key):
    st = env.state
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B, E = st.pos.shape[:2]
    return st.replace(
        pos=st.pos + jax.random.normal(k1, st.pos.shape) * 0.05,
        vel=jax.random.normal(k2, st.vel.shape) * 0.3,
        ang_vel=st.ang_vel + jax.random.normal(k3, st.ang_vel.shape) * 0.2,
        force=jax.random.normal(k4, st.force.shape) * 0.5,
        torque=jax.random.normal(k4, st.torque.shape) * 0.2,
    )


def _make_step_pair(scenario, num_envs, seed, monkeypatch, **kwargs):
    """Two independent envs (identical construction): one permanently on the
    XLA path, one permanently fused. Separate instances + a flag that stays
    set across the first (tracing) call avoid jax.jit's lazy-trace/cache
    pitfall that previously made this test vacuous. A wrapped counter proves
    the pallas kernel is actually traced in."""
    from vmas_tpu.core import fused as _fused

    env_ref = make_env(scenario, num_envs=num_envs, seed=seed, **kwargs)
    env_fus = make_env(scenario, num_envs=num_envs, seed=seed, **kwargs)
    env_fus.world.fused = True
    assert _fused.supports(env_fus.world), f"{scenario}: fused path unsupported"

    calls = {"n": 0}
    orig = _fused.fused_physics_step

    def counted(world, state):
        calls["n"] += 1
        return orig(world, state)

    monkeypatch.setattr(_fused, "fused_physics_step", counted)
    return env_ref, env_fus, jax.jit(env_ref.world.step), jax.jit(env_fus.world.step), calls


@pytest.mark.parametrize("scenario", sorted(CASES))
def test_fused_matches_xla(scenario, monkeypatch):
    if scenario in CPU_SKIP and jax.default_backend() == "cpu":
        pytest.skip("interpret mode too slow on CPU; covered on-chip by "
                    "tests/golden/bench_fused_v2.py")
    env_ref, env_fus, step_ref, step_fus, calls = _make_step_pair(
        SCENARIO_OF.get(scenario, scenario), 7, 3, monkeypatch,
        **KWARGS.get(scenario, {})
    )
    state = _randomized(env_ref, jax.random.PRNGKey(42))

    ref = state
    fus = state
    for t in range(STEPS.get(scenario, 4)):
        ref = step_ref(ref)
        fus = step_fus(fus)
        for name in ("pos", "vel", "rot", "ang_vel", "force", "torque"):
            np.testing.assert_allclose(
                np.asarray(getattr(fus, name)),
                np.asarray(getattr(ref, name)),
                atol=1e-5, rtol=1e-5,
                err_msg=f"{scenario}: {name} diverged at step {t}",
            )
    assert calls["n"] >= 1, "fused_physics_step was never traced — test vacuous"


# (scenario, kwargs, scratch_key, steps) — default configs roll 4 steps;
# non-default variants pin their static branches in 2 (the interpret-mode
# kernel on the 1-vCPU CI host costs real seconds per execution)
@pytest.mark.parametrize(
    "scenario,kwargs,scratch_key,steps",
    [
        ("transport", dict(n_agents=3), "global_shaping", 4),
        ("wheel", dict(n_agents=3), "rew", 4),
        ("reverse_transport", dict(n_agents=4), "global_shaping", 4),
        ("balance", dict(n_agents=3), "global_shaping", 4),
        ("dropout", dict(n_agents=4), "eaten", 4),
        ("flocking", dict(n_agents=4), "distance_shaping", 4),
        ("dispersion", dict(n_agents=4), "eaten", 4),
        ("dispersion", dict(n_agents=4, share_reward=True, penalise_by_time=True), "eaten", 2),
        ("navigation", dict(n_agents=4), "pos_shaping", 4),
        ("navigation", dict(n_agents=4, shared_rew=False, observe_all_goals=True), "pos_shaping", 2),
        ("give_way", dict(), "shaping", 4),
        ("give_way", dict(observe_rel_pos=True, obs_noise=0.02, done_on_completion=True), "shaping", 2),
        ("passage", dict(), "global_shaping", 4),
        ("passage", dict(n_passages=2, shared_reward=True), "global_shaping", 2),
        ("joint_passage", dict(), "pos_shaping_pre", 2),
        ("joint_passage", dict(observe_joint_angle=True, joint_angle_obs_noise=0.01, obs_noise=0.02, asym_package=False), "pos_shaping_pre", 2),
        ("joint_passage_size", dict(), "pos_shaping_pre", 4),
        ("joint_passage_size", dict(observe_joint_angle=True, obs_noise=0.02, middle_angle_180=True), "pos_shaping_pre", 2),
        ("simple_spread", dict(n_agents=3), "rew", 4),
        ("discovery", dict(), "covered_targets", 4),
        ("discovery", dict(shared_reward=True, agent_collision_penalty=-1.0, targets_respawn=False), "covered_targets", 2),
        ("multi_give_way", dict(), "shaping", 4),
        ("multi_give_way", dict(obs_noise=0.02, shared_rew=True), "shaping", 2),
        ("ball_trajectory", dict(), "speed_shaping", 2),
        ("ball_trajectory", dict(joints=False, pos_shaping_factor=1, dist_shaping_factor=1), "speed_shaping", 2),
        ("buzz_wire", dict(), "pos_shaping", 2),
        ("ball_passage", dict(), "pos_shaping_pre", 4),
        ("ball_passage", dict(n_passages=2, fixed_passage=True), "pos_shaping_pre", 2),
        ("het_mass", dict(), "max_speed", 4),
        ("waterfall", dict(), None, 4),
        ("simple", dict(), None, 4),
        ("simple_push", dict(), "goal_idx", 4),
        ("simple_adversary", dict(n_agents=3), "goal_idx", 4),
        ("simple_adversary", dict(n_agents=4, n_adversaries=2), "goal_idx", 2),
        ("simple_tag", dict(), "per_agent_rew", 4),
        ("simple_reference", dict(), "goal_b_0", 4),
        ("simple_speaker_listener", dict(), "goal_idx", 4),
        ("simple_world_comm", dict(), None, 4),
        ("simple_world_comm", dict(num_good_agents=3, num_adversaries=2, num_forests=1, num_food=3), None, 2),
        ("simple_tag", dict(shape_agent_rew=True, shape_adversary_rew=True, agents_share_rew=True, adversaries_share_rew=False, observe_same_team=False, observe_pos=False), "per_agent_rew", 2),
        # scripted red AI + ball script run pre-kernel; obs/rew/done as rows
        ("football", dict(), "pos_shaping_blue", 2),
        # both teams policy: red-team x-flip rows + dense_red branch
        ("football", dict(ai_red_agents=False), "pos_shaping_red", 2),
    ],
)
def test_fused_outputs_match_scenario_path(scenario, kwargs, scratch_key,
                                           steps, monkeypatch):
    """Scenario-fused outputs (obs/rewards/done emitted as kernel rows —
    Scenario.make_fused_outputs) must equal the normal hook pipeline:
    same obs, same rewards, same dones, same scratch evolution.

    Stiff-joint worlds (substeps x joint_force) drift fused-vs-XLA in the
    PHYSICS itself by ~1e-3 within a step or two (measured on the bare
    kernels; see test_fused_joints_match_xla) — comparing outputs across
    the two physics paths there would only bound that drift. For those,
    the reference env runs the SAME fused physics with the outputs object
    suppressed, so the hooks-vs-kernel-rows comparison is physics-identical
    and stays tight."""
    stiff_joints = scenario in ("joint_passage", "ball_trajectory", "buzz_wire")
    if stiff_joints:
        import importlib

        mod = importlib.import_module(f"vmas_tpu.scenarios.{scenario}")
        mk = mod.Scenario.make_fused_outputs
        monkeypatch.delattr(mod.Scenario, "make_fused_outputs")
        env_ref = make_env(scenario, num_envs=5, seed=2, fused_physics=True,
                           **kwargs)
        assert env_ref._fused_outputs is None
        monkeypatch.setattr(mod.Scenario, "make_fused_outputs", mk,
                            raising=False)
    else:
        env_ref = make_env(scenario, num_envs=5, seed=2, **kwargs)
    env_fus = make_env(scenario, num_envs=5, seed=2, fused_physics=True,
                       **kwargs)
    assert env_fus._fused_outputs is not None, "fused outputs not engaged"
    obs_atol = 2e-5

    for t in range(steps):
        actions = env_ref.get_random_actions()
        env_fus.get_random_actions()  # keep the obs-noise key streams in sync
        obs_r, rews_r, dones_r, infos_r = env_ref.step(actions)
        obs_f, rews_f, dones_f, infos_f = env_fus.step(actions)
        for i in range(len(obs_r)):
            np.testing.assert_allclose(
                np.asarray(obs_f[i]), np.asarray(obs_r[i]),
                atol=obs_atol, rtol=1e-5,
                err_msg=f"obs[{i}] diverged at step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(rews_f[i]), np.asarray(rews_r[i]),
                atol=2e-3, err_msg=f"rew[{i}] diverged at step {t}",
            )
        np.testing.assert_array_equal(np.asarray(dones_f), np.asarray(dones_r))
        if scratch_key is not None:  # scratch-free scenarios (waterfall)
            np.testing.assert_allclose(
                np.asarray(env_fus.state.scenario[scratch_key]),
                np.asarray(env_ref.state.scenario[scratch_key]),
                atol=2e-3, err_msg=f"scratch diverged at step {t}",
            )


def test_fused_composes_with_env_sharding():
    """fused physics under an env-axis mesh: the pallas grid only blocks the
    lane (env) axis, so pjit partitions it per shard."""
    from vmas_tpu.parallel import distribute

    env = make_env("transport", num_envs=64, seed=0, fused_physics=True)
    distribute(env)
    for _ in range(2):
        obs, rews, dones, infos = env.step(env.get_random_actions())
    assert np.isfinite(np.asarray(obs[0])).all()
    assert "env" in str(env.state.pos.sharding)


def test_fused_joints_match_xla(monkeypatch):
    """joint constraint forces + fixed-rotation torques in the fused kernel
    (joint_passage: rigid two-agent joint through a passage, substeps)."""
    env_ref, env_fus, step_ref, step_fus, calls = _make_step_pair(
        "joint_passage", 5, 1, monkeypatch
    )
    state = _randomized(env_ref, jax.random.PRNGKey(8))
    ref = fus = state
    for t in range(2):
        ref = step_ref(ref)
        fus = step_fus(fus)
        for name in ("pos", "vel", "rot", "ang_vel"):
            # stiff joint constraints over substeps amplify fp reorder noise;
            # genuine fused-vs-XLA differences measure up to ~5e-5 absolute
            # at |ang_vel| ~ 4 (rel ~1.3e-5)
            np.testing.assert_allclose(
                np.asarray(getattr(fus, name)), np.asarray(getattr(ref, name)),
                atol=1e-4, rtol=5e-5, err_msg=f"joints: {name} diverged at step {t}",
            )
    assert calls["n"] >= 1, "fused_physics_step was never traced — test vacuous"



def test_fused_discovery_obs_after_respawn():
    """Covered targets respawn in post_rewards; the Lidar part of the
    observation must see the POST-respawn world (non-fused hook order).
    Regression: the fused path used to measure the Lidar in unpack, before
    post_rewards, diverging by ~0.33 whenever a target was covered."""
    kw = dict(num_envs=3, seed=0, n_agents=4, n_targets=2)
    env_x = make_env("discovery", **kw)
    env_f = make_env("discovery", fused_physics=True, **kw)
    assert env_f._fused_outputs is not None

    # park every agent ON target 0 so it is covered at the next step
    t0 = env_x.scenario._targets[0]
    for env in (env_x, env_f):
        st = env.state
        tpos = st.pos[:, t0.index]
        for a in env.agents:
            st = st.replace(pos=st.pos.at[:, a.index].set(tpos))
        env.state = st
    acts = [np.zeros((3, env_x.get_agent_action_size(a)), np.float32)
            for a in env_x.agents]
    obs_x, rews_x, *_ = env_x.step(acts)
    obs_f, rews_f, *_ = env_f.step(acts)
    assert bool(np.asarray(env_x.state.scenario["covered_targets"]).any()), \
        "setup failed: no target covered"
    for i in range(len(obs_x)):
        np.testing.assert_allclose(
            np.asarray(obs_f[i]), np.asarray(obs_x[i]), atol=2e-5,
            err_msg=f"obs[{i}] diverged on a covering step",
        )
        np.testing.assert_allclose(
            np.asarray(rews_f[i]), np.asarray(rews_x[i]), atol=2e-3)


def test_supports_rejects_many_entity_unroll():
    """The compile-time guard must count the per-entity instruction stream,
    not just pairs: a zero-pair world with hundreds of movable entities
    unrolls into a Mosaic program just as pathological as a pair-heavy one
    and must fall back to XLA."""
    from vmas_tpu.core import world as W
    from vmas_tpu.core import fused as _fused

    builder = W.World(batch_dim=2, dim_c=0, substeps=10)
    for i in range(500):
        builder.add_agent(
            W.Agent(f"a{i}", shape=W.Sphere(0.05), collide=False)
        )
    builder.finalize()
    assert not _fused.supports(builder), (
        "500 movable entities x 10 substeps passed the unroll guard"
    )


@pytest.mark.parametrize(
    "scenario,kwargs,ent_tile",
    [
        ("transport", dict(n_agents=3), "0"),   # unrolled per-pair rows
        ("transport", dict(n_agents=3), "1"),   # entity-tiled stream
        ("joint_passage", dict(), "0"),         # joints + substeps
    ],
)
def test_sublane_packing_matches_row_form(scenario, kwargs, ent_tile, monkeypatch):
    """S>1 sublane packing (fused._sublanes, opt-in — measured a loss on
    hardware, see the _sublanes comment) is a pure layout change — the
    host-side [R, B] -> [R*S, B/S] reshape is a row-major bitcast and every
    kernel op stays elementwise per env — so per-env values must match the
    S=1 row form to the usual shape-dependent-contraction slack (~1 ulp)."""
    monkeypatch.setenv("VMAS_TPU_FUSED_ENTITY_TILE", ent_tile)
    B = 256  # bp=256 -> S=2, the smallest batch the packing engages on

    envs = {}
    for s in ("1", "2"):
        monkeypatch.setenv("VMAS_TPU_FUSED_SUBLANES", s)
        env = make_env(scenario, num_envs=B, seed=3, **kwargs)
        env.world.fused = True
        envs[s] = (env, jax.jit(env.world.step))
    state = _randomized(envs["1"][0], jax.random.PRNGKey(5))

    monkeypatch.setenv("VMAS_TPU_FUSED_SUBLANES", "1")
    s1 = envs["1"][1](state)
    jax.block_until_ready(s1.pos)
    monkeypatch.setenv("VMAS_TPU_FUSED_SUBLANES", "2")
    s2 = envs["2"][1](state)
    for name in ("pos", "vel", "rot", "ang_vel", "force", "torque"):
        np.testing.assert_allclose(
            np.asarray(getattr(s2, name)), np.asarray(getattr(s1, name)),
            atol=1e-6, rtol=1e-6,
            err_msg=f"{scenario} ent_tile={ent_tile}: {name} differs packed vs row form",
        )


def test_sublane_packing_with_fused_outputs(monkeypatch):
    """Fused output rows (scratch inputs + emitted obs/rew/done) under S=2:
    the whole env.step must agree with the S=1 form."""
    B = 256
    outs = {}
    for s in ("1", "2"):
        monkeypatch.setenv("VMAS_TPU_FUSED_SUBLANES", s)
        env = make_env("transport", num_envs=B, seed=3, n_agents=3,
                       fused_physics=True)
        assert env._fused_outputs is not None
        acts = [np.full((B, env.get_agent_action_size(a)), 0.3, np.float32)
                for a in env.agents]
        obs, rews, dones, infos = env.step(acts)
        jax.block_until_ready(obs[0])
        outs[s] = (obs, rews, dones)
    for a, b in zip(jax.tree_util.tree_leaves(outs["1"]),
                    jax.tree_util.tree_leaves(outs["2"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
