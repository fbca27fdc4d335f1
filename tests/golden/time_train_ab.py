#!/usr/bin/env python
"""Attribute the rows POLICY rollout's cost (the experience-collection path)
and the PPO update on top of it — VERDICT r4 weak #1: the training path ran
68M vs the forward rollout's ~203M env-steps/s with the ~39 us/step delta
only guessed at ("policy matmuls dominate").

Same-process GROUPED A/B (docs/PERFORMANCE.md discipline: absolutes inflate
with program switches, DELTAS between variants stay decision grade; 500-step
calls amortize the ~5.4 ms tunnel dispatch). Variants of the SAME rollout
structure, each knocking one stage out:

  full      rows_policy_rollout_fn + PPO gaussian actor (f32), policy_aux on
  bf16      same, actor matmuls in bf16 with f32 accumulation
  nomatmul  policy consumes obs but does no matmuls (isolates actor FLOPs)
  noobs     policy ignores obs entirely -> XLA dead-codes the in-scan unpack
            (isolates obs unpack + transposes)
  random    rows_rollout_fn at unroll=1 (the no-policy floor, same structure)

and on top: one full PPO update (collect + GAE + 4 epochs) vs collect-only,
isolating the learner's cost.

Run ON THE CHIP (no timeout wrapper; see CLAUDE.md TPU tunnel discipline):
  nohup python tests/golden/time_train_ab.py > /tmp/train_ab.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

NUM_ENVS = 4096
N_AGENTS = 4
HORIZON = 500
REPS = 3
GROUPS = 2


def main():
    from vmas_tpu import make_env
    from vmas_tpu.parallel.ppo import (
        init_actor_critic, make_gaussian_policy, make_ppo_update, obs_dim_of,
    )
    from vmas_tpu.parallel.rollout import (
        rows_policy_rollout_fn, rows_rollout_fn, rows_rollout_supported,
    )

    # probe the device with a tiny matmul FIRST (tunnel discipline)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    sections = set(sys.argv[1:]) or {"rollout", "update"}

    env = make_env("transport", num_envs=NUM_ENVS, n_agents=N_AGENTS,
                   seed=0, fused_physics=True)
    assert rows_rollout_supported(env)
    params = init_actor_critic(
        jax.random.PRNGKey(0), obs_dim_of(env), env.agents[0].action_size
    )

    pol_f32 = make_gaussian_policy(env)
    pol_bf16 = make_gaussian_policy(env, dtype=jnp.bfloat16)
    ranges = [jnp.asarray(a.u_range_array) for a in env.agents]

    def policy_full(obs, k):
        return pol_f32(params, obs, k)[0]

    def policy_bf16(obs, k):
        return pol_bf16(params, obs, k)[0]

    def policy_nomatmul(obs, k):
        # consumes obs (unpack stays live) but no matmuls: action = first two
        # obs columns squashed — same output shapes as the actor
        return tuple(
            jnp.tanh(o[:, :2]) * ranges[i][None] for i, o in enumerate(obs)
        )

    def policy_noobs(obs, k):
        # ignores obs -> the in-scan unpack is dead-code-eliminated
        u = jax.random.uniform(k, (NUM_ENVS, 2), minval=-1.0, maxval=1.0)
        return tuple(u * ranges[i][None] for i in range(N_AGENTS))

    def policy_bf16act(obs, k):
        # bf16 ACTIVATIONS through the hidden layers (halves the HBM
        # traffic of the [B*A, 128] intermediates — the bf16-compute
        # variant measured ~0 because TPU default matmul precision is
        # already bf16-class; the bytes are the cost)
        x = jnp.stack(obs, axis=1).astype(jnp.bfloat16)
        for l in params["pi"][:-1]:
            x = jnp.tanh(x @ l["w"].astype(jnp.bfloat16)
                         + l["b"].astype(jnp.bfloat16))
        last = params["pi"][-1]
        mean = jnp.tanh(
            (x @ last["w"].astype(jnp.bfloat16)).astype(jnp.float32)
            + last["b"]
        )
        std = jnp.exp(params["log_std"])
        raw = jnp.clip(mean + std * jax.random.normal(k, mean.shape), -1, 1)
        return tuple(raw[:, i] * ranges[i][None] for i in range(N_AGENTS))

    def policy_meanonly(obs, k):
        # deterministic mean action — isolates the sampling/clip cost
        from vmas_tpu.parallel.ppo import policy_dist

        x = jnp.stack(obs, axis=1)
        mean, _ = policy_dist(params, x)
        return tuple(mean[:, i] * ranges[i][None] for i in range(N_AGENTS))

    variants = {
        "full": jax.jit(rows_policy_rollout_fn(env, policy_full, HORIZON)),
        "bf16": jax.jit(rows_policy_rollout_fn(env, policy_bf16, HORIZON)),
        "bf16act": jax.jit(
            rows_policy_rollout_fn(env, policy_bf16act, HORIZON)
        ),
        "meanonly": jax.jit(
            rows_policy_rollout_fn(env, policy_meanonly, HORIZON)
        ),
        "nomatmul": jax.jit(
            rows_policy_rollout_fn(env, policy_nomatmul, HORIZON)
        ),
        "noobs": jax.jit(rows_policy_rollout_fn(env, policy_noobs, HORIZON)),
        "random": jax.jit(rows_rollout_fn(env, HORIZON, unroll=1)),
        "random_u8": jax.jit(rows_rollout_fn(env, HORIZON)),
    }
    if "rollout" not in sections:
        variants = {}

    key = jax.random.PRNGKey(1)
    # compile + warm every variant first
    for name, fn in variants.items():
        t0 = time.perf_counter()
        s, st, traj = fn(env.state, env.steps, key)
        jax.block_until_ready(traj["rewards"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {name: float("inf") for name in variants}
    for g in range(GROUPS):
        for name, fn in variants.items():
            # grouped: reps back-to-back so the program reload cost is paid
            # once per group, not per rep
            s, st = env.state, env.steps
            _, _, traj = fn(s, st, jax.random.fold_in(key, g))
            jax.block_until_ready(traj["rewards"])  # reload + clock settle
            t0 = time.perf_counter()
            for r in range(REPS):
                s, st, traj = fn(s, st, jax.random.fold_in(key, 10 * g + r))
            jax.block_until_ready(traj["rewards"])
            dt = (time.perf_counter() - t0) / (REPS * HORIZON)
            best[name] = min(best[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.1f} us/step", flush=True)

    if variants:
        print("\n=== rows policy rollout attribution (us/step, best) ===")
        for name, v in best.items():
            print(f"{name:>10}: {v * 1e6:7.1f}")
        print(f"\nactor matmuls (full - nomatmul): "
              f"{(best['full'] - best['nomatmul']) * 1e6:+.1f} us/step")
        print(f"bf16 saving (full - bf16):        "
              f"{(best['full'] - best['bf16']) * 1e6:+.1f} us/step")
        print(f"bf16act saving (full - bf16act):  "
              f"{(best['full'] - best['bf16act']) * 1e6:+.1f} us/step")
        print(f"sampling (full - meanonly):       "
              f"{(best['full'] - best['meanonly']) * 1e6:+.1f} us/step")
        print(f"obs unpack  (nomatmul - noobs):   "
              f"{(best['nomatmul'] - best['noobs']) * 1e6:+.1f} us/step")
        print(f"decode+keys (noobs - random@u1):  "
              f"{(best['noobs'] - best['random']) * 1e6:+.1f} us/step")

    if "update" not in sections:
        return

    # ---- the PPO update on top: full update vs collect-only ----
    print("\n=== PPO update (horizon 128, 4 epochs) ===", flush=True)
    upd_f32, opt = make_ppo_update(env, horizon=128, collect="rows", epochs=4)
    upd_bf16, _ = make_ppo_update(env, horizon=128, collect="rows", epochs=4,
                                  compute_dtype=jnp.bfloat16)
    collect_only = jax.jit(rows_policy_rollout_fn(
        env, lambda obs, k: pol_f32(params, obs, k), 128, policy_aux=True
    ))
    opt_state = opt.init(params)

    upd_variants = {
        "update_f32": jax.jit(upd_f32),
        "update_bf16": jax.jit(upd_bf16),
    }
    for name, fn in upd_variants.items():
        t0 = time.perf_counter()
        out = fn(params, opt_state, env.state, env.steps, key)
        jax.block_until_ready(out[4]["loss"])
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _, _, tr = collect_only(env.state, env.steps, key)
    jax.block_until_ready(tr["rewards"])
    print(f"[compile] collect128: {time.perf_counter() - t0:.1f}s", flush=True)

    ubest = {"update_f32": float("inf"), "update_bf16": float("inf"),
             "collect128": float("inf")}
    for g in range(GROUPS):
        for name, fn in upd_variants.items():
            out = fn(params, opt_state, env.state, env.steps,
                     jax.random.fold_in(key, g))
            jax.block_until_ready(out[4]["loss"])
            t0 = time.perf_counter()
            for r in range(REPS):
                out = fn(params, opt_state, env.state, env.steps,
                         jax.random.fold_in(key, 10 * g + r))
            jax.block_until_ready(out[4]["loss"])
            dt = (time.perf_counter() - t0) / (REPS * 128)
            ubest[name] = min(ubest[name], dt)
            print(f"[group {g}] {name}: {dt * 1e6:.1f} us/env-step "
                  f"({NUM_ENVS * 128 * REPS / (dt * REPS * 128) / 1e6:.1f}M "
                  f"env-steps/s)", flush=True)
        _, _, tr = collect_only(env.state, env.steps, jax.random.fold_in(key, g))
        jax.block_until_ready(tr["rewards"])
        t0 = time.perf_counter()
        for r in range(REPS):
            _, _, tr = collect_only(env.state, env.steps,
                                    jax.random.fold_in(key, 20 * g + r))
        jax.block_until_ready(tr["rewards"])
        dt = (time.perf_counter() - t0) / (REPS * 128)
        ubest["collect128"] = min(ubest["collect128"], dt)
        print(f"[group {g}] collect128: {dt * 1e6:.1f} us/env-step", flush=True)

    print("\n=== PPO attribution (us per env-step at horizon 128) ===")
    for name, v in ubest.items():
        print(f"{name:>12}: {v * 1e6:7.1f}  "
              f"({NUM_ENVS / v / 1e6:.1f}M env-steps/s)")
    print(f"learner cost (update_f32 - collect128): "
          f"{(ubest['update_f32'] - ubest['collect128']) * 1e6:+.1f} us/env-step")


if __name__ == "__main__":
    main()
