"""Rows-carried rollout (parallel/rollout.py rows_rollout_fn) vs the
standard env._step_fn_raw scan.

The rows path restructures the rollout so the scan carry is the fused
kernel's own row buffer — same kernel, same decode math (a single IEEE
multiply), same emit rows — so for the same key the TRAJECTORY AND FINAL
STATE must match the standard rollout_fn bitwise (any drift means the
restructure changed semantics, which it must never do).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.parallel.rollout import (
    rollout_fn,
    rows_policy_rollout_fn,
    rows_rollout_fn,
    rows_rollout_supported,
)


def _envs(**kw):
    return make_env("transport", num_envs=32, seed=0, fused_physics=True, **kw)


def test_supported_exactly_on_bench_class():
    assert rows_rollout_supported(_envs(n_agents=4))
    # XLA physics -> not eligible
    assert not rows_rollout_supported(make_env("transport", num_envs=8, seed=0))
    # joints are eligible since round 4 (fixed-rotation rows ride the
    # carry); the PID controller config joined in round 5 (the controller
    # is realized in-kernel via process_act_rows + ctrl carry rows)
    env_j = make_env("joint_passage", num_envs=8, seed=0, fused_physics=True)
    assert rows_rollout_supported(env_j)
    env_jc = make_env("joint_passage", num_envs=8, seed=0, fused_physics=True,
                      use_controller=True)
    assert rows_rollout_supported(env_jc)
    # scripted NON-POLICY agent (flocking's circling target): eligible
    # since round 5 — the scenario declares the script precomputable
    # (script_slots/script_us), so the target's u rides the action rows
    env_f = make_env("flocking", num_envs=8, seed=0, fused_physics=True)
    assert rows_rollout_supported(env_f)
    # ... but the POLICY rows path refuses scripts (rollout() gates it)
    import pytest as _pytest
    from vmas_tpu.parallel.rollout import rows_policy_rollout_fn as _rpf
    with _pytest.raises(AssertionError):
        _rpf(env_f, lambda o, k: o, horizon=2)
    # comm worlds are eligible since round 4 (physics ignores comm; the
    # rollout hoists the comm decode and substitutes per-step uc)
    env_c = make_env("simple_reference", num_envs=8, seed=0, fused_physics=True)
    assert rows_rollout_supported(env_c)
    # give_way's DEFAULT config (PID velocity controller ON) is eligible
    # since round 5: process_action is realized in-kernel
    # (process_act_rows). The dt_delay>0 config's action queue is NOT —
    # that config must keep the hook pipeline.
    env_p = make_env("give_way", num_envs=8, seed=0, fused_physics=True)
    assert rows_rollout_supported(env_p)
    env_pd = make_env("give_way", num_envs=8, seed=0, fused_physics=True,
                      dt_delay=2)
    assert not rows_rollout_supported(env_pd)


@pytest.mark.parametrize("n_agents,horizon", [(4, 7), (3, 4)])
def test_rows_rollout_matches_standard(n_agents, horizon):
    env_a = _envs(n_agents=n_agents)
    env_b = _envs(n_agents=n_agents)
    key = jax.random.PRNGKey(11)

    run_std = jax.jit(rollout_fn(env_a, horizon=horizon))
    run_rows = jax.jit(rows_rollout_fn(env_b, horizon=horizon))

    s_std, t_std, traj_std = run_std(env_a.state, env_a.steps, key)
    s_rows, t_rows, traj_rows = run_rows(env_b.state, env_b.steps, key)

    # obs and dones are bitwise; rewards may differ by ONE rounding on CPU:
    # in interpret mode the kernel's emit ops inline into two different XLA
    # programs, which may FMA-contract `prev - dist*factor` differently
    # (measured exactly 7.6e-06 = half an ulp at transport's shaping scale).
    # On hardware both modes are the same Mosaic-compiled emit code.
    np.testing.assert_allclose(
        np.asarray(traj_std["rewards"]), np.asarray(traj_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(traj_std["dones"]), np.asarray(traj_rows["dones"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(traj_std["obs"]),
                    jax.tree_util.tree_leaves(traj_rows["obs"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(t_std), np.asarray(t_rows))
    # final state: bitwise, except the scenario's "rew" scratch (the same
    # one-rounding FMA caveat as the trajectory rewards above)
    sc_a = dict(s_std.scenario)
    sc_b = dict(s_rows.scenario)
    np.testing.assert_allclose(
        np.asarray(sc_a.pop("rew")), np.asarray(sc_b.pop("rew")),
        atol=3e-5, rtol=0,
    )
    s_std = s_std.replace(scenario=sc_a)
    s_rows = s_rows.replace(scenario=sc_b)
    flat_a, tree_a = jax.tree_util.tree_flatten(s_std)
    flat_b, tree_b = jax.tree_util.tree_flatten(s_rows)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "scenario,kwargs",
    [
        ("wheel", dict(n_agents=3)),
        ("reverse_transport", dict(n_agents=4)),
        ("balance", dict(n_agents=3)),
        ("passage", dict()),
        ("simple_spread", dict(n_agents=3)),  # the reference's GPU-benchmark protocol scenario
        ("simple", dict()),
        ("simple_tag", dict()),
        ("simple_push", dict()),        # goal_idx scratch carried unchanged (None)
        ("simple_adversary", dict()),   # goal_idx scratch carried unchanged (None)
        ("dropout", dict(n_agents=3)),  # unpack_reads=("u",): per-step u substituted
        ("dispersion", dict(n_agents=4)),  # eaten emitted in-kernel; just_eaten None-carried
        ("navigation", dict(n_agents=3)),  # unpack_reads=("state",): Lidar from recorded carries
        ("navigation", dict(n_agents=3, collisions=False)),  # lidar off: plain rows
        # scripted circling target precomputed over the horizon
        # (script_us) + clock carried as a kernel row + Lidar from
        # recorded carries — the wave-3 script class
        ("flocking", dict(n_agents=3)),
        # controller disabled -> process_action is a declared no-op
        ("give_way", dict(use_velocity_controller=False)),
        # DEFAULT config: PID velocity controller realized IN-KERNEL
        # (process_act_rows + 4 ctrl carry rows per agent + raw-u emit)
        ("give_way", dict()),
        ("multi_give_way", dict()),
        # football two-policy-team config: ball anti-stall script runs
        # IN-KERNEL (process_act_rows), red policy agents' x-mirror is a
        # decode transform, dense shaping rides the carry
        ("football", dict(ai_red_agents=False)),
        # comm worlds: per-step uc substituted into unpack
        ("simple_reference", dict()),
        ("simple_speaker_listener", dict()),
        ("simple_world_comm", dict()),
    ],
)
def test_rows_rollout_other_scenarios(scenario, kwargs):
    """Every scenario declaring carry_extra_idx must replay the standard
    rollout to ~1 ulp/step. (Unlike transport, whose replay happens to stay
    bitwise on CPU, passage's contact chains pick up one FMA rounding per
    step between the two interpret-mode compilations — the same
    shape-dependent-contraction caveat as the trajectory rewards; measured
    5.96e-08 = 1 ulp at pos scale.)"""
    env_a = make_env(scenario, num_envs=16, seed=0, fused_physics=True, **kwargs)
    env_b = make_env(scenario, num_envs=16, seed=0, fused_physics=True, **kwargs)
    assert rows_rollout_supported(env_b), scenario
    key = jax.random.PRNGKey(3)
    s_std, t_std, traj_std = jax.jit(rollout_fn(env_a, horizon=5))(
        env_a.state, env_a.steps, key
    )
    s_rows, t_rows, traj_rows = jax.jit(rows_rollout_fn(env_b, horizon=5))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(traj_std["rewards"]), np.asarray(traj_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(traj_std["dones"]), np.asarray(traj_rows["dones"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(traj_std["obs"]),
                    jax.tree_util.tree_leaves(traj_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    for f in ("pos", "vel", "rot", "ang_vel", "force", "torque"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_std, f)), np.asarray(getattr(s_rows, f)),
            atol=1e-6, rtol=0, err_msg=f"{scenario}: final {f}",
        )
    # post_rewards side effects outside scratch (dropout's goal-render
    # toggle) must land in the final state too
    np.testing.assert_array_equal(
        np.asarray(s_std.rendering), np.asarray(s_rows.rendering),
        err_msg=f"{scenario}: final rendering",
    )
    for k in s_std.scenario:
        for a, b in zip(jax.tree_util.tree_leaves(s_std.scenario[k]),
                        jax.tree_util.tree_leaves(s_rows.scenario[k])):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=3e-5, rtol=0, err_msg=f"{scenario}: scratch[{k}]",
            )


@pytest.mark.parametrize(
    "scenario,kwargs",
    [
        ("waterfall", dict()),
        ("buzz_wire", dict()),
        ("ball_passage", dict()),
        ("ball_trajectory", dict()),
        ("joint_passage", dict()),  # default config: controller off (noop declared)
        ("joint_passage", dict(use_controller=True)),  # PID in-kernel
        ("joint_passage_size", dict()),  # 7 reset-only map rows None-carried
        ("joint_passage_size", dict(use_vel_controller=True)),  # PID in-kernel
    ],
)
def test_rows_rollout_joint_scenarios(scenario, kwargs):
    """Joint worlds ride the rows carry too (joint_fixed_rot rows pass
    through unchanged — sync_joints is reset-only). CPU interpret mode
    compounds ~1 ulp/substep of FMA-contraction drift through the stiff
    joint constraints (the docs/FUSED_OUTPUTS.md rule-10 caveat), so the
    tolerance here is looser than the joint-free cases; on hardware both
    paths run the same Mosaic-compiled kernel."""
    env_a = make_env(scenario, num_envs=8, seed=0, fused_physics=True, **kwargs)
    env_b = make_env(scenario, num_envs=8, seed=0, fused_physics=True, **kwargs)
    assert rows_rollout_supported(env_b), scenario
    key = jax.random.PRNGKey(3)
    s_std, _, traj_std = jax.jit(rollout_fn(env_a, horizon=5))(
        env_a.state, env_a.steps, key
    )
    s_rows, _, traj_rows = jax.jit(rows_rollout_fn(env_b, horizon=5))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(traj_std["rewards"]), np.asarray(traj_rows["rewards"]),
        atol=5e-4, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(traj_std["obs"]),
                    jax.tree_util.tree_leaves(traj_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=0)
    for f in ("pos", "vel", "rot"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_std, f)), np.asarray(getattr(s_rows, f)),
            atol=5e-5, rtol=0, err_msg=f"{scenario}: final {f}",
        )
    # final scenario scratch too (clocks/shapings/controller memory) —
    # catches step-counter drift the reward/obs comparison cannot see
    for k in s_std.scenario:
        for a, b in zip(jax.tree_util.tree_leaves(s_std.scenario[k]),
                        jax.tree_util.tree_leaves(s_rows.scenario[k])):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=5e-4, rtol=0, err_msg=f"{scenario}: scratch[{k}]",
            )


@pytest.mark.parametrize("multidiscrete", [False, True])
def test_rows_rollout_discrete_actions(multidiscrete):
    """The reference's published GPU-benchmark protocol (simple_spread,
    discrete actions) — the rows path's hoisted mixed-radix/odd-n decode
    must replay the standard rollout like the continuous one does."""
    kw = dict(num_envs=16, seed=0, fused_physics=True, n_agents=3,
              continuous_actions=False, multidiscrete_actions=multidiscrete)
    env_a = make_env("simple_spread", **kw)
    env_b = make_env("simple_spread", **kw)
    assert rows_rollout_supported(env_b)
    key = jax.random.PRNGKey(7)
    s_std, t_std, traj_std = jax.jit(rollout_fn(env_a, horizon=5))(
        env_a.state, env_a.steps, key
    )
    s_rows, t_rows, traj_rows = jax.jit(rows_rollout_fn(env_b, horizon=5))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(traj_std["rewards"]), np.asarray(traj_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(traj_std["obs"]),
                    jax.tree_util.tree_leaves(traj_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    for f in ("pos", "vel", "u"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_std, f)), np.asarray(getattr(s_rows, f)),
            atol=1e-6, rtol=0, err_msg=f"final {f}",
        )


def test_rows_policy_rollout_matches_standard():
    """rows_policy_rollout_fn vs rollout_fn with the SAME policy callable:
    the policy consumes the previous step's emitted obs in both paths, so
    trajectories must replay (same CPU FMA-contraction caveats as above)."""
    env_a = _envs(n_agents=3)
    env_b = _envs(n_agents=3)
    obs_w = int(np.asarray(env_a.reset(seed=0)[0]).shape[-1])
    rng = np.random.default_rng(0)
    Ws = [jnp.asarray(rng.normal(size=(obs_w, 2)) * 0.3, jnp.float32)
          for _ in env_a.agents]

    def policy(obs, key):
        return tuple(
            jnp.tanh(o @ Ws[i])
            + 0.01 * jax.random.uniform(jax.random.fold_in(key, i), (o.shape[0], 2))
            for i, o in enumerate(obs)
        )

    env_a.reset(seed=0)
    env_b.reset(seed=0)
    key = jax.random.PRNGKey(13)
    s_std, t_std, tr_std = jax.jit(rollout_fn(env_a, policy, horizon=4))(
        env_a.state, env_a.steps, key
    )
    s_rows, t_rows, tr_rows = jax.jit(rows_policy_rollout_fn(env_b, policy, horizon=4))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(tr_std["rewards"]), np.asarray(tr_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(tr_std["dones"]), np.asarray(tr_rows["dones"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(tr_std["obs"]),
                    jax.tree_util.tree_leaves(tr_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    for f in ("pos", "vel", "u"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_std, f)), np.asarray(getattr(s_rows, f)),
            atol=1e-6, rtol=0, err_msg=f"final {f}",
        )
    np.testing.assert_array_equal(np.asarray(t_std), np.asarray(t_rows))


def test_rows_policy_rollout_comm():
    """Policy rollouts on comm worlds: the in-body comm decode + state.c
    substitution must replay the standard policy rollout."""
    kw = dict(num_envs=8, seed=0, fused_physics=True)
    env_a = make_env("simple_reference", **kw)
    env_b = make_env("simple_reference", **kw)
    act_w = env_a.get_agent_action_size(env_a.agents[0])
    rng = np.random.default_rng(3)
    obs_w = int(np.asarray(env_a.reset(seed=0)[0]).shape[-1])
    env_a.reset(seed=0)
    Ws = [jnp.asarray(rng.normal(size=(obs_w, act_w)) * 0.2, jnp.float32)
          for _ in env_a.agents]

    def policy(obs, key):
        # physical part in [-1,1], comm part in [0,1] — mirrors the
        # continuous action-space contract
        return tuple(
            jnp.concatenate(
                [jnp.tanh((o @ Ws[i])[:, :2]),
                 jax.nn.sigmoid((o @ Ws[i])[:, 2:])], -1)
            for i, o in enumerate(obs)
        )

    key = jax.random.PRNGKey(23)
    s_std, _, tr_std = jax.jit(rollout_fn(env_a, policy, horizon=4))(
        env_a.state, env_a.steps, key
    )
    s_rows, _, tr_rows = jax.jit(
        rows_policy_rollout_fn(env_b, policy, horizon=4)
    )(env_b.state, env_b.steps, key)
    for a, b in zip(jax.tree_util.tree_leaves(tr_std["obs"]),
                    jax.tree_util.tree_leaves(tr_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    np.testing.assert_allclose(
        np.asarray(tr_std["rewards"]), np.asarray(tr_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for f in ("pos", "vel", "uc", "c"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_std, f)), np.asarray(getattr(s_rows, f)),
            atol=1e-6, rtol=0, err_msg=f"final {f}",
        )


def test_rows_policy_rollout_controller():
    """POLICY rollout through the in-kernel PID controller class (the PPO
    collection path for give_way's default config): the ctrl carry rows
    and the controller's raw-u emit must replay the standard policy
    rollout, including the final controller memory."""
    kw = dict(num_envs=16, seed=0, fused_physics=True)
    env_a = make_env("give_way", **kw)
    env_b = make_env("give_way", **kw)
    obs_w = int(np.asarray(env_a.reset(seed=0)[0]).shape[-1])
    env_a.reset(seed=0)
    W = jnp.asarray(np.ones((obs_w, 2), np.float32) * 0.3)
    policy = lambda obs, key: tuple(jnp.tanh(o @ W) for o in obs)
    key = jax.random.PRNGKey(29)
    s_std, _, tr_std = jax.jit(rollout_fn(env_a, policy, horizon=5))(
        env_a.state, env_a.steps, key
    )
    s_rows, _, tr_rows = jax.jit(
        rows_policy_rollout_fn(env_b, policy, horizon=5)
    )(env_b.state, env_b.steps, key)
    np.testing.assert_allclose(
        np.asarray(tr_std["rewards"]), np.asarray(tr_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(tr_std["obs"]),
                    jax.tree_util.tree_leaves(tr_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    for ua, ub in zip(s_std.u, s_rows.u):
        np.testing.assert_allclose(np.asarray(ua), np.asarray(ub),
                                   atol=1e-6, rtol=0, err_msg="final u")
    for a in env_a.agents:
        k = f"__vel_ctrl_{a.name}"
        for f in ("accum_errs", "prev_err"):
            np.testing.assert_allclose(
                np.asarray(s_std.scenario[k][f]),
                np.asarray(s_rows.scenario[k][f]),
                atol=1e-6, rtol=0, err_msg=f"{k}.{f}",
            )


def test_rows_policy_rollout_discrete():
    """Discrete policy (obs-dependent integer actions) through the rows
    path — exercises the per-step mixed-radix decode inside the scan."""
    kw = dict(num_envs=16, seed=0, fused_physics=True, n_agents=3,
              continuous_actions=False)
    env_a = make_env("simple_spread", **kw)
    env_b = make_env("simple_spread", **kw)

    def policy(obs, key):
        return tuple(
            (jnp.abs(o).sum(-1) * 97.0).astype(jnp.int32) % 5 for o in obs
        )

    key = jax.random.PRNGKey(2)
    _, _, tr_std = jax.jit(rollout_fn(env_a, policy, horizon=4))(
        env_a.state, env_a.steps, key
    )
    _, _, tr_rows = jax.jit(rows_policy_rollout_fn(env_b, policy, horizon=4))(
        env_b.state, env_b.steps, key
    )
    for a, b in zip(jax.tree_util.tree_leaves(tr_std["obs"]),
                    jax.tree_util.tree_leaves(tr_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    np.testing.assert_allclose(
        np.asarray(tr_std["rewards"]), np.asarray(tr_rows["rewards"]),
        atol=3e-5, rtol=0,
    )


@pytest.mark.parametrize("k_steps", [2, 3])
def test_rows_rollout_k_steps(k_steps):
    """k_steps>1 packs several FULL env steps into one kernel call — the
    trajectory must replay k_steps=1 (measured a perf LOSS on hardware,
    kept as a documented dead end; docs/PERFORMANCE.md)."""
    env_a = _envs(n_agents=3)
    env_b = _envs(n_agents=3)
    key = jax.random.PRNGKey(17)
    _, _, t1 = jax.jit(rows_rollout_fn(env_a, horizon=6))(
        env_a.state, env_a.steps, key
    )
    _, _, tK = jax.jit(rows_rollout_fn(env_b, horizon=6, k_steps=k_steps))(
        env_b.state, env_b.steps, key
    )
    for a, b in zip(jax.tree_util.tree_leaves(t1["obs"]),
                    jax.tree_util.tree_leaves(tK["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    np.testing.assert_allclose(
        np.asarray(t1["rewards"]), np.asarray(tK["rewards"]),
        atol=3e-5, rtol=0,
    )


def test_rows_rollout_truncation():
    env = make_env("transport", num_envs=16, seed=0, fused_physics=True,
                   n_agents=4, max_steps=3)
    env_b = make_env("transport", num_envs=16, seed=0, fused_physics=True,
                     n_agents=4, max_steps=3)
    key = jax.random.PRNGKey(5)
    _, _, traj_std = jax.jit(rollout_fn(env, horizon=5))(env.state, env.steps, key)
    _, _, traj_rows = jax.jit(rows_rollout_fn(env_b, horizon=5))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_array_equal(
        np.asarray(traj_std["dones"]), np.asarray(traj_rows["dones"])
    )


def _chunked_eager(env, horizon, reset_every, state, steps, key,
                   policy=None):
    """The _chunked_reset_rollout semantics spelled out with the STANDARD
    rollout per chunk — the comparator for the rows version."""
    chunk_fn = jax.jit(rollout_fn(env, policy, horizon=reset_every))
    parts = []
    for c in range(horizon // reset_every):
        kc = jax.random.fold_in(key, 2 * c)
        kr = jax.random.fold_in(key, 2 * c + 1)
        state, steps, traj = chunk_fn(state, steps, kc)
        state, steps, obs_reset, _, _, _ = env._reset_masked(
            state, steps, kr, None
        )
        traj["obs"] = jax.tree_util.tree_map(
            lambda o, r: o.at[-1].set(r), traj["obs"], obs_reset
        )
        traj["dones"] = traj["dones"].at[-1].set(True)
        parts.append(traj)
    out = {
        k: jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[p[k] for p in parts]
        )
        for k in ("rewards", "dones", "obs")
    }
    return state, steps, out


def test_rows_rollout_u_noise():
    """u_noise configs ride the rows path since round 5: the rollout
    hoists the decode's noise draws over the horizon with the step
    pipeline's own key schedule — trajectories must replay the standard
    rollout like the noise-free class does."""
    env_a, env_b = _envs(n_agents=3), _envs(n_agents=3)
    for e in (env_a, env_b):
        for a in e.agents:
            a.u_noise_array[:] = 0.05
    assert rows_rollout_supported(env_b)
    key = jax.random.PRNGKey(13)
    s_std, _, t_std = jax.jit(rollout_fn(env_a, horizon=5))(
        env_a.state, env_a.steps, key
    )
    s_rows, _, t_rows = jax.jit(rows_rollout_fn(env_b, horizon=5))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(t_std["rewards"]), np.asarray(t_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(t_std["obs"]),
                    jax.tree_util.tree_leaves(t_rows["obs"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ua, ub in zip(s_std.u, s_rows.u):
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    # the noise actually fired (trajectory differs from the noise-free run)
    env_c = _envs(n_agents=3)
    _, _, t_clean = jax.jit(rollout_fn(env_c, horizon=5))(
        env_c.state, env_c.steps, key
    )
    assert np.abs(
        np.asarray(t_clean["obs"][0]) - np.asarray(t_std["obs"][0])
    ).max() > 1e-4


def test_rows_rollout_comm_noise():
    """c_noise comm streams: the hoisted comm decode adds the per-step
    noise draws; physics copies the noisy uc into state.c, which the comm
    worlds' unpack reads."""
    kw = dict(num_envs=8, seed=0, fused_physics=True)
    env_a = make_env("simple_reference", **kw)
    env_b = make_env("simple_reference", **kw)
    for e in (env_a, env_b):
        for a in e.agents:
            a.c_noise = 0.1
    assert rows_rollout_supported(env_b)
    key = jax.random.PRNGKey(17)
    s_std, _, t_std = jax.jit(rollout_fn(env_a, horizon=4))(
        env_a.state, env_a.steps, key
    )
    s_rows, _, t_rows = jax.jit(rows_rollout_fn(env_b, horizon=4))(
        env_b.state, env_b.steps, key
    )
    for a, b in zip(jax.tree_util.tree_leaves(t_std["obs"]),
                    jax.tree_util.tree_leaves(t_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)
    np.testing.assert_array_equal(np.asarray(s_std.c), np.asarray(s_rows.c))


@pytest.mark.parametrize("use_policy", [False, True])
def test_rows_rollout_obs_noise(use_policy):
    """obs_noise configs: unpack declares the per-step obs-key read
    (unpack_reads=("obs_key",)); the rollout substitutes the step
    pipeline's own keys, so noisy observations are bitwise the hook
    pipeline's — on BOTH rows paths."""
    kw = dict(num_envs=16, seed=0, fused_physics=True, obs_noise=0.05)
    env_a = make_env("give_way", **kw)
    env_b = make_env("give_way", **kw)
    assert rows_rollout_supported(env_b)
    key = jax.random.PRNGKey(19)
    if use_policy:
        obs_w = int(env_a.observation_space[0].shape[0])
        W = jnp.asarray(np.ones((obs_w, 2), np.float32) * 0.05)
        pol = lambda obs, k: tuple(jnp.tanh(o @ W) for o in obs)
        run_std = jax.jit(rollout_fn(env_a, pol, horizon=4))
        run_rows = jax.jit(rows_policy_rollout_fn(env_b, pol, horizon=4))
    else:
        run_std = jax.jit(rollout_fn(env_a, horizon=4))
        run_rows = jax.jit(rows_rollout_fn(env_b, horizon=4))
    s_std, _, t_std = run_std(env_a.state, env_a.steps, key)
    s_rows, _, t_rows = run_rows(env_b.state, env_b.steps, key)
    np.testing.assert_allclose(
        np.asarray(t_std["rewards"]), np.asarray(t_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(t_std["obs"]),
                    jax.tree_util.tree_leaves(t_rows["obs"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)


def test_rows_rollout_reset_every():
    """Chunked synchronized autoreset (reset_every): same trajectory as
    the standard rollout run chunk-by-chunk with full masked resets at the
    boundaries — episodes restart, boundary obs are post-reset, boundary
    dones True."""
    env_a = _envs(n_agents=3)
    env_b = _envs(n_agents=3)
    key = jax.random.PRNGKey(9)
    run_rows = jax.jit(rows_rollout_fn(env_b, horizon=6, reset_every=3))
    s_rows, t_rows, traj_rows = run_rows(env_b.state, env_b.steps, key)
    s_std, t_std, traj_std = _chunked_eager(
        env_a, 6, 3, env_a.state, env_a.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(traj_std["rewards"]), np.asarray(traj_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(traj_std["dones"]), np.asarray(traj_rows["dones"])
    )
    assert np.asarray(traj_rows["dones"])[2].all()  # boundary step
    assert np.asarray(traj_rows["dones"])[5].all()
    for a, b in zip(jax.tree_util.tree_leaves(traj_std["obs"]),
                    jax.tree_util.tree_leaves(traj_rows["obs"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(s_std.pos), np.asarray(s_rows.pos)
    )
    np.testing.assert_array_equal(np.asarray(t_std), np.asarray(t_rows))


def test_ppo_rows_reset_every_smoke():
    """Episodic rows PPO: the update runs with reset_every and the
    recorded dones mark every boundary."""
    from vmas_tpu.parallel.ppo import (
        init_actor_critic, make_ppo_update, obs_dim_of,
    )

    env = _envs(n_agents=3)
    params = init_actor_critic(
        jax.random.PRNGKey(0), obs_dim_of(env), env.agents[0].action_size
    )
    update, opt = make_ppo_update(
        env, horizon=4, collect="rows", epochs=1, reset_every=2
    )
    opt_state = opt.init(params)
    params2, _, _, _, metrics = jax.jit(update)(
        params, opt_state, env.state, env.steps, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # 2 boundaries in 4 steps -> at least half the dones are True
    assert float(metrics["episode_done_frac"]) >= 0.5


def test_rollout_convenience_upgrades_to_rows():
    """rollout() transparently selects the rows paths for eligible envs;
    the returned trajectory must equal a manual rollout_fn run bitwise
    (the upgrade must be unobservable)."""
    from vmas_tpu.parallel.rollout import rollout

    env_a = _envs(n_agents=3)
    env_b = _envs(n_agents=3)
    key = jax.random.PRNGKey(21)
    traj = rollout(env_a, horizon=4, key=key)
    _, _, traj_ref = jax.jit(rollout_fn(env_b, horizon=4))(
        env_b.state, env_b.steps, key
    )
    np.testing.assert_allclose(
        np.asarray(traj["rewards"]), np.asarray(traj_ref["rewards"]),
        atol=3e-5, rtol=0,
    )
    for a, b in zip(jax.tree_util.tree_leaves(traj["obs"]),
                    jax.tree_util.tree_leaves(traj_ref["obs"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ineligible env still works through the general path
    env_c = make_env("transport", num_envs=8, seed=0)  # XLA physics
    traj_c = rollout(env_c, horizon=2, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(traj_c["obs"][0])).all()
    # POLICY rollouts on unpack_reads=("state",) envs (navigation's Lidar)
    # must fall back to the general path — the policy would need per-step
    # state reconstruction otherwise
    env_n = make_env("navigation", num_envs=8, seed=0, fused_physics=True,
                     n_agents=3)
    obs_w = int(np.asarray(env_n.reset(seed=0)[0]).shape[-1])
    W = jnp.asarray(np.ones((obs_w, 2), np.float32) * 0.05)
    pol = lambda obs, key: tuple(jnp.tanh(o @ W) for o in obs)
    traj_n = rollout(env_n, pol, horizon=2, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(traj_n["obs"][0])).all()


def test_rollout_honors_rows_auto_optout(monkeypatch):
    """football declares rows_auto=False (rows measured 0.91x for its
    emit-row width): rollout() must keep the standard path even though
    rows_rollout_supported is True."""
    import sys

    mod = sys.modules["vmas_tpu.parallel.rollout"]
    from vmas_tpu.parallel.rollout import rollout

    env = make_env("football", num_envs=8, seed=0, fused_physics=True,
                   ai_red_agents=False)
    assert rows_rollout_supported(env)

    def boom(*a, **k):
        raise AssertionError("rollout() must not auto-pick rows here")

    monkeypatch.setattr(mod, "rows_rollout_fn", boom)
    traj = rollout(env, horizon=2, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(traj["rewards"])).all()


def test_rows_rollout_sharded():
    """The carry rows are [Rc, B] with envs on the minor axis; under an
    env-axis mesh the pallas grid blocks that axis, so pjit partitions it
    per shard exactly like fused_physics_step."""
    from vmas_tpu.parallel import distribute

    env = _envs(n_agents=4)
    distribute(env)
    run = jax.jit(rows_rollout_fn(env, horizon=3))
    s, t, traj = run(env.state, env.steps, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(traj["obs"][0])).all()
