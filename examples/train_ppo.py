"""End-to-end PPO training on a vmas_tpu scenario (multi-agent, shared policy).

The RL-framework example the reference ships as ``vmas/examples/rllib.py``
(RLlib PPO + wandb); the TPU-native equivalent keeps the whole
rollout-collect + GAE + clipped-surrogate update as ONE jitted program per
phase, sharded over the env-axis Mesh: every chip steps its env shard and
evaluates the policy on it, gradients all-reduce over ICI (XLA inserts the
collectives from the shardings).

Run (single chip, or a pod slice, or a virtual CPU mesh):
  python -m examples.train_ppo --scenario transport --num_envs 512 --iters 20
  python -m examples.train_ppo --num_envs 256 --virtual_devices 8
"""

import argparse
import time

import jax
import jax.numpy as jnp


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


def _mlp(layers, x):
    for layer in layers[:-1]:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x @ layers[-1]["w"] + layers[-1]["b"]


def policy_dist(params, obs):
    """Diagonal Gaussian in the pre-scale action space [-1, 1]."""
    mean = jnp.tanh(_mlp(params["pi"], obs))
    return mean, jnp.exp(params["log_std"])


def gaussian_logp(mean, std, x):
    return (-0.5 * ((x - mean) / std) ** 2 - jnp.log(std)
            - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


def make_ppo_update(env, horizon=32, lr=3e-4, gamma=0.99, lam=0.95,
                    clip=0.2, epochs=4, vf_coeff=0.5, ent_coeff=0.0):
    """(params, opt_state, state, steps, key) ->
    (params', opt_state', state', steps', metrics) — fully jittable.

    One shared actor-critic for all agents (parameter sharing, the standard
    VMAS baseline): the agent axis is folded into the batch for both the
    rollout and the update.
    """
    import optax

    agents = env.agents
    assert env.continuous_actions, "this example samples a Gaussian policy"
    assert len({a.action_size for a in agents}) == 1, (
        "the shared actor-critic folds agents into the batch — it needs "
        "homogeneous action sizes (write a per-agent-params variant otherwise)"
    )
    assert env.world.dim_c == 0 or all(a.silent for a in agents), (
        "this example does not model communication actions; pick a comm-free "
        "scenario or extend the policy head by dim_c columns"
    )
    opt = optax.adam(lr)

    def _obs_mat(state, k):
        # the env's own obs pipeline (plural batch hook aware); requires
        # homogeneous obs widths to stack into [B, A, O]
        return jnp.stack(env._obs_fn_raw(state, k), axis=1)

    def collect(params, state, steps, key):
        def one_step(carry, k):
            state, steps = carry
            obs = _obs_mat(state, jax.random.fold_in(k, 2))  # [B, A, O]
            mean, std = policy_dist(params, obs)
            raw = mean + std * jax.random.normal(jax.random.fold_in(k, 0), mean.shape)
            raw = jnp.clip(raw, -1.0, 1.0)
            logp = gaussian_logp(mean, std, raw)
            value = _mlp(params["v"], obs)[..., 0]  # [B, A]
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
            params["v"], _obs_mat(state, jax.random.fold_in(key, 4))
        )[..., 0]
        return state, steps, traj, last_value

    def gae(traj, last_value):
        def scan_back(adv, x):
            delta, nonterm = x
            adv = delta + gamma * lam * nonterm * adv
            return adv, adv

        values = jnp.concatenate([traj["value"], last_value[None]], axis=0)
        nonterm = 1.0 - traj["done"][..., None].astype(jnp.float32)  # [T, B, 1]
        deltas = traj["rew"] + gamma * nonterm * values[1:] - values[:-1]
        _, advs = jax.lax.scan(
            scan_back, jnp.zeros_like(last_value), (deltas, nonterm), reverse=True
        )
        return advs, advs + traj["value"]

    def loss_fn(params, batch):
        mean, std = policy_dist(params, batch["obs"])
        logp = gaussian_logp(mean, std, batch["act"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv, jnp.clip(ratio, 1 - clip, 1 + clip) * adv
        ).mean()
        value = _mlp(params["v"], batch["obs"])[..., 0]
        vf = ((value - batch["ret"]) ** 2).mean()
        entropy = (jnp.log(std) + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum()
        return pg + vf_coeff * vf - ent_coeff * entropy, (pg, vf)

    def update(params, opt_state, state, steps, key):
        state, steps, traj, last_value = collect(params, state, steps, key)
        advs, rets = gae(traj, last_value)
        # fold T and A into the batch; keep B leading so the env-axis
        # sharding carries into the update (grads all-reduce over the mesh)
        flat = {
            "obs": traj["obs"], "act": traj["act"], "logp": traj["logp"],
            "adv": advs, "ret": rets,
        }

        def one_epoch(carry, _):
            # full-batch epochs — deliberately no minibatch shuffling (the
            # whole batch fits on-chip), so no per-epoch randomness is needed
            params, opt_state = carry
            (loss, (pg, vf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, flat
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_epoch, (params, opt_state), None, length=epochs
        )
        metrics = {
            "loss": losses[-1],
            "mean_reward": traj["rew"].mean(),
            "episode_done_frac": traj["done"].mean(),
        }
        return params, opt_state, state, steps, metrics

    return update, opt


def main(scenario="transport", num_envs=512, iters=50, horizon=32, lr=3e-4,
         virtual_devices=0, seed=0):
    if virtual_devices:
        jax.config.update("jax_num_cpu_devices", int(virtual_devices))
        jax.config.update("jax_platforms", "cpu")
    import optax  # noqa: F401  (fail fast if unavailable)

    from vmas_tpu import make_env
    from vmas_tpu.parallel import distribute

    env = make_env(scenario, num_envs=num_envs, seed=seed)
    distribute(env)  # env-axis mesh over all devices (asserts divisibility)
    mesh = env.mesh
    print(f"mesh: {mesh.devices.size} devices, {num_envs} envs "
          f"({num_envs // mesh.devices.size}/device)")

    obs_dims = {
        o.shape[-1] for o in env._obs_fn_raw(env.state, jax.random.PRNGKey(0))
    }
    assert len(obs_dims) == 1, (
        f"shared actor-critic needs homogeneous obs widths, got {obs_dims}"
    )
    params = init_actor_critic(
        jax.random.PRNGKey(seed), obs_dims.pop(), env.agents[0].action_size
    )
    update, opt = make_ppo_update(env, horizon=horizon, lr=lr)
    opt_state = opt.init(params)
    state = env.state
    steps = env.steps

    step_fn = jax.jit(update)
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    for it in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, state, steps, metrics = step_fn(
            params, opt_state, state, steps, k
        )
        if it % 5 == 0 or it == iters - 1:
            print(
                f"iter {it:4d}  loss {float(metrics['loss']):+.4f}  "
                f"mean_rew {float(metrics['mean_reward']):+.4f}  "
                f"done_frac {float(metrics['episode_done_frac']):.3f}"
            )
    dt = time.perf_counter() - t0
    sps = iters * horizon * num_envs / dt
    print(f"{iters} PPO iters x {horizon} steps x {num_envs} envs in {dt:.1f}s "
          f"= {sps:,.0f} env-steps/s (incl. learning)")
    return params


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario", default="transport")
    p.add_argument("--num_envs", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--virtual_devices", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    main(**vars(args))
