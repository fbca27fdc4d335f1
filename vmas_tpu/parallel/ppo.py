"""PPO training on vmas_tpu environments — the library version of the
RL-framework integration the reference demonstrates via RLlib
(``/root/reference/vmas/examples/rllib.py:56-120``): a shared actor-critic
over all agents, clipped-surrogate PPO, everything one jitted program per
iteration, sharded over the env-axis Mesh (gradients all-reduce over ICI —
XLA inserts the collectives from the shardings).

Two experience-collection modes:

* ``collect="step"`` — the env's own step function scanned per step with
  per-step masked autoreset (terminated envs restart inside the rollout);
  logp/value are computed in-scan. Works on every env; the episodic-
  training-correct default for scenarios that terminate.
* ``collect="rows"`` — the rows-carried policy rollout
  (``rows_policy_rollout_fn``): the scan body is the policy plus ONE fused
  pallas kernel call, so collection runs at rows-rollout speed. Sampled raw
  actions and log-probs are recorded in-scan via ``policy_aux``; values are
  recomputed POST-scan in one batched matmul over T*B*A (far better MXU
  shapes than per-step [B*A] matmuls, and it keeps the in-scan body
  minimal). No in-scan autoreset: episodes end by GAE's nonterm mask, and
  the caller resets between updates (or sizes max_steps to the horizon).
  Requires ``rows_rollout_supported(env)``.

``collect="auto"`` picks rows when eligible, else step.

The actor-critic is the standard VMAS baseline: one shared tanh MLP pair
(parameter sharing), diagonal Gaussian in the pre-scale action space
[-1, 1], agents folded into the batch. ``compute_dtype=jnp.bfloat16``
runs the MLP matmuls on the MXU in bf16 with f32 accumulation (the
TPU-native training idiom); params, sampling and the loss stay f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vmas_tpu.parallel.rollout import (
    rollout_fn,
    rows_policy_rollout_fn,
    rows_rollout_supported,
)


def init_actor_critic(key, obs_dim, act_dim, hidden=(128, 128)):
    import numpy as np

    def dense(k, m, n, scale):
        return {
            "w": jax.random.normal(k, (m, n), jnp.float32) * scale / np.sqrt(m),
            "b": jnp.zeros((n,), jnp.float32),
        }

    n_layers = len(hidden) + 1
    ks = jax.random.split(key, 2 * n_layers)
    sizes = (obs_dim,) + tuple(hidden)
    hidden_pairs = list(zip(sizes[:-1], sizes[1:]))
    return {
        "pi": [dense(ks[i], m, n, 1.0) for i, (m, n) in enumerate(hidden_pairs)]
        + [dense(ks[n_layers - 1], sizes[-1], act_dim, 0.01)],
        "v": [dense(ks[n_layers + i], m, n, 1.0) for i, (m, n) in enumerate(hidden_pairs)]
        + [dense(ks[2 * n_layers - 1], sizes[-1], 1, 1.0)],
        "log_std": jnp.full((act_dim,), -0.5, jnp.float32),
    }


def _mlp(layers, x, dtype=None):
    """Shared MLP trunk. ``dtype=jnp.bfloat16`` keeps the HIDDEN
    activations in bf16 end to end (cast once on entry, tanh in bf16,
    f32 only at the head) — params and the output stay f32. On TPU the
    MXU already runs f32 matmuls at bf16-class precision/speed (default
    precision), so the win is the halved activation HBM traffic in the
    training update, not FLOPs; a per-layer cast variant measured WORSE
    (extra casts, tests/golden/time_train_ab.py round 5)."""
    if dtype is not None:
        x = x.astype(dtype)
        for layer in layers[:-1]:
            x = jnp.tanh(x @ layer["w"].astype(dtype)
                         + layer["b"].astype(dtype))
        last = layers[-1]
        return (x @ last["w"].astype(dtype)).astype(jnp.float32) + last["b"]
    for layer in layers[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def policy_dist(params, obs, dtype=None):
    """Diagonal Gaussian in the pre-scale action space [-1, 1]."""
    mean = jnp.tanh(_mlp(params["pi"], obs, dtype))
    return mean, jnp.exp(params["log_std"])


def gaussian_logp(mean, std, x):
    return (-0.5 * ((x - mean) / std) ** 2 - jnp.log(std)
            - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


def _check_homogeneous(env):
    agents = env.agents
    assert env.continuous_actions, "the PPO helpers sample a Gaussian policy"
    assert len({a.action_size for a in agents}) == 1, (
        "the shared actor-critic folds agents into the batch — it needs "
        "homogeneous action sizes (write a per-agent-params variant otherwise)"
    )
    assert env.world.dim_c == 0 or all(a.silent for a in agents), (
        "these helpers do not model communication actions; pick a comm-free "
        "scenario or extend the policy head by dim_c columns"
    )


def make_gaussian_policy(env, params_holder=None, dtype=None):
    """``policy(params, obs_tuple, key) -> (actions_tuple, aux)`` for the
    rollout fns' ``policy_aux`` contract: samples the clipped Gaussian,
    scales to each agent's u_range, and returns ``aux = {"raw", "logp"}``
    captured at sampling time."""
    agents = env.agents
    ranges = [jnp.asarray(a.u_range_array) for a in agents]

    def policy(params, obs, key):
        x = jnp.stack(obs, axis=1)  # [B, A, O]
        mean, std = policy_dist(params, x, dtype)
        raw = mean + std * jax.random.normal(key, mean.shape)
        raw = jnp.clip(raw, -1.0, 1.0)
        logp = gaussian_logp(mean, std, raw)
        actions = tuple(raw[:, i] * ranges[i][None] for i in range(len(agents)))
        return actions, {"raw": raw, "logp": logp}

    return policy


def make_ppo_update(env, horizon=32, lr=3e-4, gamma=0.99, lam=0.95,
                    clip=0.2, epochs=4, vf_coeff=0.5, ent_coeff=0.0,
                    collect="auto", compute_dtype=None,
                    rollout_unroll: Optional[int] = None,
                    reset_every: Optional[int] = None):
    """Build ``(params, opt_state, state, steps, key) ->
    (params', opt_state', state', steps', metrics)`` — fully jittable,
    shards over the env-axis mesh like everything else.

    One shared actor-critic for all agents (parameter sharing, the standard
    VMAS baseline): the agent axis is folded into the batch for both the
    rollout and the update. See the module docstring for the ``collect``
    modes; ``compute_dtype=jnp.bfloat16`` keeps the MLP hidden activations
    in bf16 (measured 1.53x on the update — docs/PERFORMANCE.md round 5).
    ``reset_every=N`` (rows mode): synchronized episodic resets every N
    collection steps — fixed-length episodes at rows speed, with boundary
    obs/done following the gymnasium-vec convention so GAE cuts correctly.
    """
    import optax

    _check_homogeneous(env)
    if collect == "auto":
        collect = "rows" if rows_rollout_supported(env) else "step"
    assert collect in ("rows", "step"), collect
    if collect == "rows":
        assert rows_rollout_supported(env), (
            "collect='rows' needs a rows-eligible env (rows_rollout_supported)"
            " — use collect='step'"
        )

    agents = env.agents
    dtype = compute_dtype
    opt = optax.adam(lr)

    def loss_fn(params, batch):
        mean, std = policy_dist(params, batch["obs"], dtype)
        logp = gaussian_logp(mean, std, batch["act"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - clip, 1 + clip) * adv
        ).mean()
        value = _mlp(params["v"], batch["obs"], dtype)[..., 0]
        vf = ((value - batch["ret"]) ** 2).mean()
        entropy = (jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum()
        return pg + vf_coeff * vf - ent_coeff * entropy, (pg, vf)

    def gae(rews, dones, values):
        """rews [T, B, A], dones [T, B], values [T+1, B, A]."""
        nonterm = 1.0 - dones[..., None].astype(jnp.float32)  # [T, B, 1]
        deltas = rews + gamma * nonterm * values[1:] - values[:-1]

        def scan_back(adv, x):
            delta, nt = x
            adv = delta + gamma * lam * nt * adv
            return adv, adv

        _, advs = jax.lax.scan(
            scan_back, jnp.zeros_like(values[-1]), (deltas, nonterm),
            reverse=True,
        )
        return advs, advs + values[:-1]

    def fit(params, opt_state, flat):
        def one_epoch(carry, _):
            # full-batch epochs — deliberately no minibatch shuffling (the
            # whole batch fits on-chip), so no per-epoch randomness is needed
            params, opt_state = carry
            (loss, (pg, vf)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, flat)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_epoch, (params, opt_state), None, length=epochs
        )
        return params, opt_state, losses

    if collect == "rows":
        policy = make_gaussian_policy(env, dtype=dtype)

        def update(params, opt_state, state, steps, key):
            run = rows_policy_rollout_fn(
                env, lambda obs, k: policy(params, obs, k), horizon,
                unroll=rollout_unroll, policy_aux=True,
                reset_every=reset_every,
            )
            state, steps, traj = run(state, steps, key)
            obs_emitted = jnp.stack(traj["obs"], axis=2)  # [T, B, A, O]
            obs0 = jnp.stack(traj["obs0"], axis=1)  # [B, A, O]
            # the action at step t was sampled from the obs emitted at t-1
            # (obs0 at t=0); the final emitted obs bootstraps the value tail
            obs_act = jnp.concatenate([obs0[None], obs_emitted[:-1]], axis=0)
            obs_all = jnp.concatenate([obs_act, obs_emitted[-1:]], axis=0)
            values = _mlp(params["v"], obs_all, dtype)[..., 0]  # [T+1, B, A]
            advs, rets = gae(traj["rewards"], traj["dones"], values)
            flat = {
                "obs": obs_act,
                "act": traj["policy_aux"]["raw"],
                "logp": traj["policy_aux"]["logp"],
                "adv": advs, "ret": rets,
            }
            params, opt_state, losses = fit(params, opt_state, flat)
            metrics = {
                "loss": losses[-1],
                "mean_reward": traj["rewards"].mean(),
                "episode_done_frac": traj["dones"].mean(),
            }
            return params, opt_state, state, steps, metrics

        return update, opt

    # ---- collect == "step": per-step masked autoreset, in-scan values ----
    def _obs_mat(state, k):
        # the env's own obs pipeline (plural batch hook aware); requires
        # homogeneous obs widths to stack into [B, A, O]
        return jnp.stack(env._obs_fn_raw(state, k), axis=1)

    def collect_step(params, state, steps, key):
        def one_step(carry, k):
            state, steps = carry
            obs = _obs_mat(state, jax.random.fold_in(k, 2))  # [B, A, O]
            mean, std = policy_dist(params, obs, dtype)
            raw = mean + std * jax.random.normal(
                jax.random.fold_in(k, 0), mean.shape
            )
            raw = jnp.clip(raw, -1.0, 1.0)
            logp = gaussian_logp(mean, std, raw)
            value = _mlp(params["v"], obs, dtype)[..., 0]  # [B, A]
            actions = tuple(
                raw[:, i] * jnp.asarray(a.u_range_array)[None]
                for i, a in enumerate(agents)
            )
            state, _, rews, terminated, truncated, _, steps = env._step_fn_raw(
                state, steps, actions, jax.random.fold_in(k, 1)
            )
            done = terminated | truncated
            out = dict(obs=obs, act=raw, logp=logp, value=value,
                       rew=jnp.stack(rews, axis=-1), done=done)
            # autoreset: terminated envs restart inside the rollout, so the
            # policy never trains on absorbing post-episode states (GAE's
            # nonterm mask already cuts the bootstrap at the boundary)
            state, steps, _, _, _, _ = env._reset_masked(
                state, steps, jax.random.fold_in(k, 3), done
            )
            return (state, steps), out

        (state, steps), traj = jax.lax.scan(
            one_step, (state, steps), jax.random.split(key, horizon)
        )
        last_value = _mlp(
            params["v"], _obs_mat(state, jax.random.fold_in(key, 4)), dtype
        )[..., 0]
        return state, steps, traj, last_value

    def update(params, opt_state, state, steps, key):
        state, steps, traj, last_value = collect_step(params, state, steps, key)
        values = jnp.concatenate([traj["value"], last_value[None]], axis=0)
        advs, rets = gae(traj["rew"], traj["done"], values)
        flat = {
            "obs": traj["obs"], "act": traj["act"], "logp": traj["logp"],
            "adv": advs, "ret": rets,
        }
        params, opt_state, losses = fit(params, opt_state, flat)
        metrics = {
            "loss": losses[-1],
            "mean_reward": traj["rew"].mean(),
            "episode_done_frac": traj["done"].mean(),
        }
        return params, opt_state, state, steps, metrics

    return update, opt


def make_evaluate(env, horizon=100):
    """Deterministic evaluation rollout: ``(params, state, steps, key) ->
    (state', steps', metrics)`` running the policy MEAN (no sampling)
    through the fastest eligible rollout path; metrics hold the mean
    per-step reward and the fraction of envs that finished an episode.
    Use a fresh ``env.reset()`` state for comparable numbers."""
    from vmas_tpu.parallel.rollout import (
        rollout_fn, rows_policy_rollout_fn, rows_rollout_supported,
    )

    _check_homogeneous(env)
    agents = env.agents
    ranges = [jnp.asarray(a.u_range_array) for a in agents]

    def policy_of(params):
        def policy(obs, key):
            x = jnp.stack(obs, axis=1)
            mean, _ = policy_dist(params, x)
            return tuple(
                mean[:, i] * ranges[i][None] for i in range(len(agents))
            )

        return policy

    rows_ok = rows_rollout_supported(env) and (
        "state" not in getattr(env._fused_outputs, "unpack_reads", ())
        and not getattr(env._fused_outputs, "script_slots", ())
    )

    def run(params, state, steps, key):
        pol = policy_of(params)
        build = (
            rows_policy_rollout_fn(env, pol, horizon)
            if rows_ok else rollout_fn(env, pol, horizon)
        )
        state, steps, traj = build(state, steps, key)
        metrics = {
            "mean_reward": traj["rewards"].mean(),
            "episode_done_frac": traj["dones"].any(axis=0).mean(),
        }
        return state, steps, metrics

    return run


def obs_dim_of(env, key=None):
    """The (asserted homogeneous) per-agent observation width."""
    if key is None:
        key = jax.random.PRNGKey(0)
    dims = {int(o.shape[-1]) for o in env._obs_fn_raw(env.state, key)}
    assert len(dims) == 1, (
        f"shared actor-critic needs homogeneous obs widths, got {dims}"
    )
    return dims.pop()
