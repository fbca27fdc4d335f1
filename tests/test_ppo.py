"""PPO library (parallel/ppo.py) and the policy_aux rollout contract.

The rows-collected PPO path must see EXACTLY the data the standard path
would: the policy_aux recording (raw samples + logp captured at sampling
time) and the obs0/shift-by-one alignment are what make the update correct,
so both are pinned against the standard rollout here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmas_tpu import make_env
from vmas_tpu.parallel.ppo import (
    gaussian_logp,
    init_actor_critic,
    make_gaussian_policy,
    make_ppo_update,
    obs_dim_of,
    policy_dist,
)
from vmas_tpu.parallel.rollout import (
    rollout_fn,
    rows_policy_rollout_fn,
    rows_rollout_supported,
)


def _env(**kw):
    kw.setdefault("num_envs", 16)
    kw.setdefault("n_agents", 3)
    return make_env("transport", seed=0, fused_physics=True, **kw)


def _params(env, seed=0):
    return init_actor_critic(
        jax.random.PRNGKey(seed), obs_dim_of(env), env.agents[0].action_size
    )


def test_policy_aux_rows_matches_standard():
    """Same key, same policy: the rows policy rollout with policy_aux
    records the SAME trajectory and the SAME aux stream as rollout_fn
    (both split the rollout key identically)."""
    env_a, env_b = _env(), _env()
    params = _params(env_a)
    pol = make_gaussian_policy(env_a)
    policy = lambda obs, k: pol(params, obs, k)
    key = jax.random.PRNGKey(3)

    run_std = jax.jit(rollout_fn(env_a, policy, horizon=5, policy_aux=True))
    run_rows = jax.jit(
        rows_policy_rollout_fn(env_b, policy, horizon=5, policy_aux=True)
    )
    _, _, t_std = run_std(env_a.state, env_a.steps, key)
    _, _, t_rows = run_rows(env_b.state, env_b.steps, key)

    for k in ("raw", "logp"):
        np.testing.assert_allclose(
            np.asarray(t_std["policy_aux"][k]),
            np.asarray(t_rows["policy_aux"][k]), atol=1e-5, rtol=0,
        )
    np.testing.assert_allclose(
        np.asarray(t_std["rewards"]), np.asarray(t_rows["rewards"]),
        atol=3e-5, rtol=0,
    )
    for oa, ob in zip(t_std["obs0"], t_rows["obs0"]):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_policy_aux_alignment():
    """The action recorded at step t was sampled from the obs emitted at
    t-1 (obs0 at t=0): recomputing the Gaussian from the shifted obs
    reproduces the recorded logp."""
    env = _env()
    params = _params(env)
    pol = make_gaussian_policy(env)
    run = jax.jit(rows_policy_rollout_fn(
        env, lambda obs, k: pol(params, obs, k), horizon=6, policy_aux=True
    ))
    _, _, traj = run(env.state, env.steps, jax.random.PRNGKey(7))

    obs_emitted = jnp.stack(traj["obs"], axis=2)  # [T, B, A, O]
    obs0 = jnp.stack(traj["obs0"], axis=1)
    obs_act = jnp.concatenate([obs0[None], obs_emitted[:-1]], axis=0)
    mean, std = policy_dist(params, obs_act)
    logp = gaussian_logp(mean, std, traj["policy_aux"]["raw"])
    err_right = np.abs(
        np.asarray(logp) - np.asarray(traj["policy_aux"]["logp"])
    ).max()
    assert err_right < 1e-4  # batched-matmul FMA noise only
    # ... and from the UNSHIFTED obs it does not (the policy actually acts
    # on the previous step's observations — a regression here means the
    # alignment silently broke and PPO would train on the wrong pairs).
    # The wrong pairing's error is bounded by how far obs drift in one step,
    # so compare RELATIVE to the recompute noise rather than absolutely.
    mean_w, std_w = policy_dist(params, obs_emitted)
    logp_w = gaussian_logp(mean_w, std_w, traj["policy_aux"]["raw"])
    err_wrong = np.abs(
        np.asarray(logp_w) - np.asarray(traj["policy_aux"]["logp"])
    ).max()
    assert err_wrong > 5 * max(err_right, 1e-6)


@pytest.mark.parametrize("collect", ["rows", "step"])
def test_ppo_update_trains(collect):
    env = _env()
    if collect == "rows":
        assert rows_rollout_supported(env)
    params = _params(env)
    update, opt = make_ppo_update(env, horizon=4, collect=collect, epochs=2)
    opt_state = opt.init(params)
    step_fn = jax.jit(update)
    state, steps = env.state, env.steps
    key = jax.random.PRNGKey(1)
    p0 = jax.tree_util.tree_leaves(params)[0]
    for i in range(2):
        params, opt_state, state, steps, metrics = step_fn(
            params, opt_state, state, steps, jax.random.fold_in(key, i)
        )
    flat = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(params)]
    )
    assert np.isfinite(flat).all()
    assert float(np.abs(np.asarray(jax.tree_util.tree_leaves(params)[0] - p0)).max()) > 0
    assert np.isfinite(float(metrics["loss"]))


def test_ppo_rows_bf16_runs():
    env = _env()
    params = _params(env)
    update, opt = make_ppo_update(
        env, horizon=3, collect="rows", epochs=1, compute_dtype=jnp.bfloat16
    )
    opt_state = opt.init(params)
    params, _, _, _, metrics = jax.jit(update)(
        params, opt_state, env.state, env.steps, jax.random.PRNGKey(0)
    )
    flat = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(params)]
    )
    assert np.isfinite(flat).all()


def test_evaluate_runs():
    from vmas_tpu.parallel.ppo import make_evaluate

    env = _env()
    params = _params(env)
    ev = jax.jit(make_evaluate(env, horizon=4))
    _, _, metrics = ev(params, env.state, env.steps, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert 0.0 <= float(metrics["episode_done_frac"]) <= 1.0


def test_ppo_rows_sharded():
    """The rows-collected PPO update runs under the env-axis mesh (the
    multichip training topology: env-sharded collection, replicated params,
    gradient all-reduce)."""
    from vmas_tpu.parallel import distribute

    env = _env(num_envs=32)
    distribute(env)
    params = _params(env)
    update, opt = make_ppo_update(env, horizon=3, collect="rows", epochs=1)
    opt_state = opt.init(params)
    params, _, state, _, metrics = jax.jit(update)(
        params, opt_state, env.state, env.steps, jax.random.PRNGKey(0)
    )
    flat = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(params)]
    )
    assert np.isfinite(flat).all()
