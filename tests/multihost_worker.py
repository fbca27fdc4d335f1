"""Multi-process worker for tests/test_multihost.py.

Each process owns 2 virtual CPU devices; N processes form one 2N-device
global mesh connected by gloo TCP collectives — the CI stand-in for
multi-host TPU over DCN (SURVEY.md section 2.13 "jax.distributed + DCN").
Runs (a) a sharded 20-step rollout and (b) one differentiable-rollout
learner step whose parameter gradient all-reduces across processes, then
dumps results for the parent test to compare against single-process truth.
"""

import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scenario", default="dispersion")
    p.add_argument("--num_envs", type=int, default=8)
    p.add_argument("--horizon", type=int, default=20)
    args = p.parse_args()

    import jax

    # BEFORE backend init (the axon sitecustomize force-sets JAX_PLATFORMS)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert len(jax.devices()) == 2 * args.num_processes, jax.devices()

    import jax.numpy as jnp

    from vmas_tpu import make_env
    from vmas_tpu.parallel.learner import init_mlp, make_train_step
    from vmas_tpu.parallel.mesh import env_mesh, shard_state
    from vmas_tpu.parallel.rollout import rollout_fn

    # (a) sharded rollout over the GLOBAL mesh
    env = make_env(args.scenario, num_envs=args.num_envs, seed=0)
    mesh = env_mesh()  # all global devices
    assert mesh.devices.size == 2 * args.num_processes
    state = shard_state(env.state, mesh)
    run = jax.jit(rollout_fn(env, horizon=args.horizon))
    state, steps, traj = run(state, env.steps, jax.random.PRNGKey(0))

    # every process holds the same global arrays logically; materialize them
    from jax.experimental import multihost_utils

    final_pos = multihost_utils.process_allgather(state.pos, tiled=True)
    rew_sum = float(jnp.sum(traj["rewards"]))

    # (b) one learner step: replicated params, env-sharded state -> the
    # parameter gradient is a cross-process all-reduce
    env_g = make_env(args.scenario, num_envs=args.num_envs, seed=0,
                     grad_enabled=True)
    state_g = shard_state(env_g.state, mesh)
    obs_dim = env_g.scenario.observation(env_g.agents[0], env_g.state).shape[-1]
    out_dim = max(a.action_size for a in env_g.agents) + env_g.world.dim_c
    params = init_mlp(jax.random.PRNGKey(1), [obs_dim, 32, out_dim])
    train = jax.jit(make_train_step(env_g, horizon=3, lr=1e-2))
    params, _, _, loss = train(params, state_g, env_g.steps, jax.random.PRNGKey(2))
    # force a fully-replicated layout so every process can read the whole
    # vector locally; the values are identical across processes iff the
    # parameter gradient was all-reduced
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    flatten = jax.jit(
        lambda p: jnp.concatenate(
            [jnp.ravel(l) for l in jax.tree_util.tree_leaves(p)]
        ),
        out_shardings=rep,
    )
    flat = np.asarray(flatten(params).addressable_data(0))
    loss = np.asarray(
        jax.jit(lambda x: x, out_shardings=rep)(loss).addressable_data(0)
    )

    np.savez(
        os.path.join(args.out, f"proc{args.process_id}.npz"),
        final_pos=np.asarray(final_pos),
        rew_sum=np.float64(rew_sum),
        params=flat,
        loss=np.float64(loss),
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
