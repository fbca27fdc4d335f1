"""Env-axis sharding over TPU meshes.

This is the data parallelism of an environment simulator (SURVEY.md section
2.13): a 1D ``Mesh(('env',))`` over all chips, every ``[B, ...]`` state leaf
sharded on its leading env axis with ``NamedSharding(P('env'))``. Because JAX
computation follows data, sharding the state pytree once makes every jitted
step/reset run SPMD across chips with XLA inserting any needed collectives;
multi-host (DCN) works identically via ``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def env_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1D mesh over the env axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        # applies to explicit device lists too — silently ignoring it there
        # would hand back a bigger mesh than the caller asked for
        devices = list(devices)[:n_devices]
    return Mesh(np.asarray(devices), ("env",))


def shard_state(tree, mesh: Mesh, batch_dim: Optional[int] = None):
    """Place every leading-[B] leaf of a state pytree on the env axis.

    Leaves whose leading dim is not the env axis (e.g. [2] uint32 PRNG keys in
    scenario scratch) are replicated instead — same rule as
    ``WorldState.blend``.
    """
    if batch_dim is None and hasattr(tree, "batch_dim"):
        batch_dim = int(tree.batch_dim)  # WorldState knows its env axis
    if batch_dim is None:
        sizes = {}
        for leaf in jax.tree.leaves(tree):
            if getattr(leaf, "ndim", 0) > 0:
                sizes[leaf.shape[0]] = sizes.get(leaf.shape[0], 0) + 1
        if not sizes:
            raise ValueError(
                "shard_state could not infer the env axis (no array leaves); "
                "pass batch_dim explicitly"
            )
        batch_dim = max(sizes, key=sizes.get)
    env_sharding = NamedSharding(mesh, P("env"))
    replicated = NamedSharding(mesh, P())

    def place(x):
        if getattr(x, "ndim", 0) > 0 and x.shape[0] == batch_dim:
            return jax.device_put(x, env_sharding)
        return jax.device_put(x, replicated)

    return jax.tree.map(place, tree)


def distribute(env, mesh: Optional[Mesh] = None):
    """Shard a live Environment's state over a mesh (in place).

    After this, every ``env.step`` runs SPMD over the mesh — each chip steps
    its ``B / n_devices`` env shard in lockstep.
    """
    if mesh is None:
        mesh = env_mesh()
    n = mesh.devices.size
    assert env.num_envs % n == 0, (
        f"num_envs={env.num_envs} must divide evenly over {n} devices"
    )
    env.state = shard_state(env.state, mesh, batch_dim=env.num_envs)
    env.steps = jax.device_put(env.steps, NamedSharding(mesh, P("env")))
    env.mesh = mesh
    return env
