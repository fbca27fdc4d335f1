"""Env-axis sharding, compiled rollouts and the data-parallel learner
(runs on the virtual 8-device CPU mesh from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from vmas_tpu import make_env
from vmas_tpu.parallel import distribute, env_mesh, rollout, rollout_fn
from vmas_tpu.parallel.learner import init_mlp, make_train_step


def test_distribute_and_step():
    assert len(jax.devices()) == 8
    env = make_env("transport", num_envs=16, seed=0)
    distribute(env)
    assert "env" in str(env.state.pos.sharding)
    obs, rews, dones, infos = env.step(env.get_random_actions())
    assert np.isfinite(np.asarray(obs[0])).all()
    # sharded partial reset
    env.reset_at(3)
    assert int(env.steps[3]) == 0


def test_sharded_matches_single_device():
    """SPMD execution must be numerically identical to single-device."""
    env1 = make_env("dispersion", num_envs=16, seed=7)
    env2 = make_env("dispersion", num_envs=16, seed=7)
    distribute(env2)
    o1 = env1.reset(seed=7)
    o2 = env2.reset(seed=7)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-6)
    acts = [jnp.full((16, 2), 0.3) for _ in env1.agents]
    for _ in range(3):
        r1 = env1.step(acts)
        r2 = env2.step(acts)
    np.testing.assert_allclose(np.asarray(r1[0][0]), np.asarray(r2[0][0]), atol=1e-5)


def test_compiled_rollout():
    env = make_env("transport", num_envs=8, seed=0)
    traj = rollout(env, horizon=5)
    assert traj["rewards"].shape == (5, 8, len(env.agents))
    assert np.isfinite(np.asarray(traj["rewards"])).all()
    assert int(env.steps[0]) == 5


def test_compiled_rollout_fused_outputs_matches_stepping():
    """The bench path — lax.scan rollout over a fused env with kernel-
    emitted outputs — must produce the same trajectory as per-step
    env.step calls (same keys: the rollout draws from the env's key
    stream the same way)."""
    env_r = make_env("transport", num_envs=6, seed=3, fused_physics=True)
    assert env_r._fused_outputs is not None
    traj = rollout(env_r, horizon=4)
    env_h = make_env("transport", num_envs=6, seed=3)
    traj_h = rollout(env_h, horizon=4)
    np.testing.assert_allclose(
        np.asarray(traj["rewards"]), np.asarray(traj_h["rewards"]), atol=2e-3
    )
    for of, oh in zip(traj["obs"], traj_h["obs"]):
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(oh), atol=2e-5, rtol=1e-5
        )
    np.testing.assert_array_equal(
        np.asarray(traj["dones"]), np.asarray(traj_h["dones"])
    )


def test_compiled_rollout_u_widening_scenario():
    """debug/drone's process_action widens state.u (3 -> 4 columns, the
    reference's oscillating action.u shape, debug/drone.py:67-74); the step
    must coerce u back to its spawn shape so it stays a valid scan carry."""
    env = make_env("drone", num_envs=4, seed=0)
    traj = rollout(env, horizon=3)
    assert traj["rewards"].shape == (3, 4, len(env.agents))
    assert env.state.u[0].shape == (4, 3)


COLLECTIVES = (
    "all-reduce", "all-gather", "collective-permute", "all-to-all",
    "reduce-scatter",
)


def test_rollout_has_no_cross_device_collectives():
    """Linear chip-scaling evidence: the compiled sharded forward rollout
    contains ZERO cross-device communication ops — each chip runs the
    identical program on its env shard with ICI idle, so env-steps/s scales
    linearly in device count by construction (the only collectives in the
    whole system are the learner's gradient/loss reductions, covered
    below)."""
    env = make_env("transport", num_envs=16, seed=0)
    distribute(env)
    run = rollout_fn(env, horizon=3)
    txt = (
        jax.jit(run)
        .lower(env.state, env.steps, jax.random.PRNGKey(0))
        .compile()
        .as_text()
    )
    found = sorted({c for c in COLLECTIVES if c in txt})
    assert not found, f"unexpected collectives in forward rollout: {found}"


def test_learner_step_allreduces():
    """The data-parallel train step DOES communicate: exactly the parameter
    gradient / loss all-reduce over the mesh, nothing else."""
    env = make_env("navigation", num_envs=8, seed=0, grad_enabled=True)
    distribute(env)
    obs_dim = int(env.observation_space[0].shape[0])
    params = init_mlp(jax.random.PRNGKey(0), [obs_dim, 16, env.agents[0].action_size])
    train = make_train_step(env, horizon=2)
    txt = (
        jax.jit(train)
        .lower(params, env.state, env.steps, jax.random.PRNGKey(1))
        .compile()
        .as_text()
    )
    assert "all-reduce" in txt
    others = sorted({c for c in COLLECTIVES[1:] if c in txt})
    assert not others, f"unexpected non-all-reduce collectives: {others}"


def test_learner_train_step():
    # navigation's shaping reward is a dense function of agent positions, so
    # gradients flow through the integrator even without any contacts
    # (transport's reward would be exactly 0-gradient until the package is hit)
    env = make_env("navigation", num_envs=8, seed=0, grad_enabled=True)
    distribute(env)
    obs_dim = int(env.observation_space[0].shape[0])
    params = init_mlp(jax.random.PRNGKey(0), [obs_dim, 16, env.agents[0].action_size])
    train = jax.jit(make_train_step(env, horizon=2))
    params2, state, steps, loss = train(params, env.state, env.steps, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # params actually changed (gradients flowed through the physics)
    delta = sum(float(jnp.abs(a["w"] - b["w"]).sum()) for a, b in zip(params, params2))
    assert delta > 0


def test_policy_rollout_uses_step_obs_and_is_differentiable():
    """The policy rollout path: (a) the policy at step t acts on the obs the
    env emitted at t-1 (carried through the scan, not re-derived from the
    carry state), and (b) gradients flow from the rollout rewards back to
    policy parameters through the carried observations."""
    import jax
    import jax.numpy as jnp

    env = make_env("navigation", num_envs=4, n_agents=2, seed=0,
                   grad_enabled=True)
    from vmas_tpu.parallel.rollout import rollout_fn

    obs_dim = int(env.observation_space[0].shape[0])
    act_dim = env.agents[0].action_size

    def run_with(params):
        def policy(obs, k):
            return tuple(jnp.tanh(o @ params) for o in obs)

        fn = rollout_fn(env, policy=policy, horizon=3)
        _, _, traj = fn(env.state, env.steps, jax.random.PRNGKey(0))
        return traj

    params = jnp.zeros((obs_dim, act_dim)) + 0.01
    # (a) trajectory obs equal the random-policy env's own emitted obs shape
    traj = jax.jit(run_with)(params)
    assert traj["obs"][0].shape == (3, 4, obs_dim)

    # (b) nonzero, finite grads through the scan-carried obs
    grad = jax.grad(lambda p: jnp.mean(jax.jit(run_with)(p)["rewards"]))(params)
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0, "no gradient flowed through the policy rollout"


def test_rollout_autoreset_matches_eager_masked_reset():
    """rollout_fn(autoreset=True) must reproduce, inside lax.scan, exactly
    what the eager step + masked-reset loop produces (the compiled analog of
    the reference's done-driven reset_at loop, environment.py:131-148)."""
    from vmas_tpu.parallel.rollout import _random_actions_for_horizon

    horizon, B = 9, 8
    env = make_env("dispersion", num_envs=B, seed=0, max_steps=4)
    key = jax.random.PRNGKey(11)
    run = jax.jit(rollout_fn(env, horizon=horizon, autoreset=True))
    state_f, steps_f, traj = run(env.state, env.steps, key)

    # eager replay with the identical key derivation
    k_pol, k_step, _ = jax.random.split(key, 3)
    pol_xs = _random_actions_for_horizon(env, k_pol, horizon)
    step_keys = jax.random.split(k_step, horizon)
    state, steps = env.state, env.steps
    for t in range(horizon):
        sk, rk = jax.random.split(step_keys[t])
        acts = tuple(a[t] for a in pol_xs)
        state, obs, rews, term, trunc, infos, steps = env._step_fn_raw(
            state, steps, acts, sk
        )
        done = term | trunc
        state, steps, obs_r, _, _, _ = env._reset_masked(state, steps, rk, done)
        obs = jax.tree_util.tree_map(
            lambda o, r: jnp.where(done.reshape((-1,) + (1,) * (o.ndim - 1)), r, o),
            obs, obs_r,
        )
        np.testing.assert_array_equal(np.asarray(traj["dones"][t]), np.asarray(done))
        # tolerances absorb scan-vs-eager fusion (FMA) rounding only; the
        # wiring under test (which envs reset, which obs are blended) would
        # diverge at O(1), not O(ulp)
        np.testing.assert_allclose(
            np.asarray(traj["rewards"][t]),
            np.asarray(jnp.stack(rews, axis=-1)), rtol=1e-5, atol=1e-6,
        )
        for a_i, o in enumerate(obs):
            np.testing.assert_allclose(
                np.asarray(traj["obs"][a_i][t]), np.asarray(o),
                rtol=1e-5, atol=1e-6,
            )
    np.testing.assert_allclose(np.asarray(state_f.pos), np.asarray(state.pos),
                               rtol=1e-5, atol=1e-6)

    # behavioral: max_steps=4 truncates every env at t=3 and t=7 (steps
    # counter was zeroed in-scan), nowhere else
    dones = np.asarray(traj["dones"])
    assert dones[3].all() and dones[7].all()
    assert not dones[[0, 1, 2, 4, 5, 6, 8]].any()
    # the carried-out steps counter reflects the in-scan resets
    assert int(steps_f[0]) == 1  # 9 steps, reset after 4 and 8
