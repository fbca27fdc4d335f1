"""Checkpoint / resume for environment state.

The reference has no (de)serialization API (SURVEY.md §5 — closest is that
all sim state is plain tensors settable via set_pos/set_vel, reference
core.py:732-742). In the TPU build the entire simulation is one pytree
(WorldState + step counters + the PRNG key), so checkpointing is exact and
cheap: save/restore round-trips bit-for-bit and resumed rollouts replay the
same trajectories.

Two backends:
* orbax (async-capable, sharding-aware — right choice on multi-host meshes):
  ``save_state_orbax`` / ``load_state_orbax``, or ``save_env`` /
  ``load_env`` with ``backend="orbax"``
* a dependency-free .npz fallback for host-local snapshots (the default)

``save_env`` / ``load_env`` capture an Environment's full mutable state.
``save_state`` / ``load_state`` operate on a raw pytree (e.g. inside a
training loop that owns its own state). Leaves are matched by flatten order,
so the restoring process must build the pytree with the same scenario config
(shape/count mismatches are rejected with a clear error).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_env", "load_env", "save_state", "load_state",
    "save_state_orbax", "load_state_orbax",
]


def _npz_path(path: str) -> str:
    # np.savez_compressed appends ".npz" when missing but np.load does not;
    # normalize so save/load round-trip with extension-less paths
    return path if path.endswith(".npz") else path + ".npz"


def save_state(state: Any, path: str) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz, host-local)."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    path = _npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(template: Any, path: str) -> Any:
    """Load a pytree saved by :func:`save_state`; ``template`` supplies the
    structure (and dtypes, which are enforced on the loaded leaves)."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(_npz_path(path))
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves)} "
            "(scenario config must match the one checkpointed)"
        )
    new_leaves = []
    for i, l in enumerate(leaves):
        loaded = data[f"leaf_{i}"]
        tmpl = jnp.asarray(l)
        if loaded.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf {i} has shape {loaded.shape}, template expects "
                f"{tmpl.shape} (scenario config must match the one checkpointed)"
            )
        new_leaves.append(_placed(l, jnp.asarray(loaded, tmpl.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _placed(template_leaf: Any, value):
    """Restore a leaf ONTO the template leaf's sharding when that sharding
    spans multiple devices — restoring into a mesh-distributed env must not
    silently de-shard it (the next jitted step would otherwise run
    single-device). Single-device leaves are NOT device_put: that would
    commit them (and everything derived from them, e.g. actions drawn from
    the restored PRNG key) to one device, which conflicts with sharded
    arguments in later jitted calls."""
    sharding = getattr(template_leaf, "sharding", None)
    if sharding is not None and len(sharding.device_set) > 1:
        return jax.device_put(value, sharding)
    if isinstance(value, jax.Array):
        # a restore backend may hand back arrays COMMITTED to one device
        # (orbax does); round-trip through host to uncommit, or arrays
        # derived from them (e.g. actions drawn from the restored PRNG key)
        # will conflict with sharded arguments in later jitted calls
        return jnp.asarray(np.asarray(value), value.dtype)
    return value


def save_env(env, path: str, backend: str = "npz") -> None:
    """Snapshot an Environment's full mutable state (world state pytree,
    step counters, PRNG key)."""
    tree = {"state": env.state, "steps": env.steps, "key": env._key}
    if backend == "orbax":
        save_state_orbax(tree, path)
    else:
        save_state(tree, path)


def load_env(env, path: str, backend: str = "npz") -> None:
    """Restore a snapshot taken by :func:`save_env` into ``env`` (must be
    built with the same scenario config)."""
    tree = {"state": env.state, "steps": env.steps, "key": env._key}
    if backend == "orbax":
        restored = load_state_orbax(tree, path)
    else:
        restored = load_state(tree, path)
    env.state = restored["state"]
    env.steps = restored["steps"]
    env._key = restored["key"]


def _orbax_safe(tree: Any) -> Any:
    # orbax refuses zero-size arrays ("Cannot save arrays with zero size"),
    # and worlds without comms carry an empty c[B, A, 0] leaf — stand in a
    # 1-element placeholder; load_state_orbax restores such leaves from the
    # template instead
    return jax.tree.map(
        lambda l: jnp.zeros((1,), jnp.asarray(l).dtype)
        if jnp.asarray(l).size == 0
        else l,
        tree,
    )


def save_state_orbax(state: Any, path: str) -> None:
    """Orbax backend: sharding-aware checkpoint for multi-host meshes."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), _orbax_safe(state), force=True)


def load_state_orbax(template: Any, path: str) -> Any:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), item=_orbax_safe(template))
    return jax.tree.map(
        lambda t, r: t if jnp.asarray(t).size == 0 else _placed(t, r),
        template, restored,
    )
