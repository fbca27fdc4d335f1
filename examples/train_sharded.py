"""Multi-chip differentiable-rollout training example.

The reference's training story is "wrap in RLlib" (vmas/examples/rllib.py);
the TPU-native equivalent is a jitted train step sharded over an env-axis
Mesh: every chip steps its shard of environments, parameter gradients are
all-reduced over ICI by XLA, and the whole loop (physics + backprop through
physics) is one compiled program.

Run on a pod slice (real devices), or locally on a virtual CPU mesh:
  python -m examples.train_sharded --scenario transport --num_envs 512 \
      --virtual_devices 8
(the flag forces the virtual mesh via jax.config, which also works where a
sitecustomize overrides the JAX_PLATFORMS environment variable)
"""

import argparse
import time

import jax
import jax.numpy as jnp

from vmas_tpu import make_env
from vmas_tpu.parallel.learner import init_mlp, make_train_step
from vmas_tpu.parallel.mesh import env_mesh, shard_state


def spawn_processes(n, argv):
    """Self-spawn ``n`` coordinated jax.distributed processes (2 virtual CPU
    devices each, gloo TCP collectives) — the single-machine stand-in for a
    multi-host launch, where each host runs this same script with its own
    --process_id and a shared --coordinator address."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "examples.train_sharded", *argv,
             "--process_id", str(i), "--num_processes", str(n),
             "--coordinator", f"localhost:{port}"],
        )
        for i in range(n)
    ]
    return max(p.wait() for p in procs)


def main(scenario="transport", num_envs=512, iters=20, horizon=5, lr=1e-3,
         virtual_devices=0, process_id=None, num_processes=None,
         coordinator=None):
    if process_id is not None:
        # one process of a multi-process (multi-host-style) launch
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(2, virtual_devices or 2))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        print(f"process {process_id}/{num_processes}: "
              f"{len(jax.local_devices())} local / {len(jax.devices())} global devices")
    elif virtual_devices:
        # force an N-device virtual CPU mesh BEFORE backend init — works
        # even where a sitecustomize overrides the JAX_PLATFORMS env var
        jax.config.update("jax_num_cpu_devices", int(virtual_devices))
        jax.config.update("jax_platforms", "cpu")
    env = make_env(scenario, num_envs=num_envs, seed=0, grad_enabled=True)
    mesh = env_mesh()
    print(f"mesh: {mesh.devices.size} devices, {num_envs} envs "
          f"({num_envs // mesh.devices.size}/device)")

    state = shard_state(env.state, mesh)
    steps = env.steps
    obs_dim = int(env.observation_space[0].shape[-1])
    act_dim = int(env.action_space[0].shape[-1])
    params = init_mlp(jax.random.PRNGKey(0), [obs_dim, 64, 64, act_dim])

    train = jax.jit(make_train_step(env, horizon=horizon, lr=lr))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, state, steps, loss = train(params, state, steps, sub)
        if i % 5 == 0 or i == iters - 1:
            print(f"iter {i:3d}  loss {float(loss):+.4f}  "
                  f"({time.perf_counter() - t0:.1f}s)")
    env_steps = iters * horizon * num_envs
    dt = time.perf_counter() - t0
    print(f"trained through {env_steps:,} env-steps in {dt:.1f}s "
          f"({env_steps / dt:,.0f} env-steps/s incl. backprop)")


if __name__ == "__main__":
    import sys

    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="transport")
    p.add_argument("--num_envs", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--horizon", type=int, default=5)
    p.add_argument("--virtual_devices", type=int, default=0,
                   help="simulate an N-device CPU mesh (0 = real devices)")
    p.add_argument("--processes", type=int, default=0,
                   help="self-spawn N jax.distributed processes (multi-host "
                        "stand-in: 2 virtual CPU devices each, gloo TCP)")
    # set on the spawned workers by spawn_processes
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--coordinator", default=None)
    args = p.parse_args()
    if args.processes:
        argv, skip = [], False
        for a in sys.argv[1:]:
            if skip:
                skip = False
                continue
            if a == "--processes":
                skip = True
            elif not a.startswith("--processes="):
                argv.append(a)
        sys.exit(spawn_processes(args.processes, argv))
    main(args.scenario, args.num_envs, args.iters, args.horizon,
         virtual_devices=args.virtual_devices, process_id=args.process_id,
         num_processes=args.num_processes, coordinator=args.coordinator)
