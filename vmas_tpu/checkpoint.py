"""Checkpoint / resume for environment state.

The reference has no (de)serialization API (SURVEY.md §5 — closest is that
all sim state is plain tensors settable via set_pos/set_vel, reference
core.py:732-742). In the TPU build the entire simulation is one pytree
(WorldState + step counters + the PRNG key), so checkpointing is exact and
cheap: save/restore round-trips bit-for-bit and resumed rollouts replay the
same trajectories.

Two backends:
* orbax (async-capable, sharding-aware — right choice on multi-host meshes)
* a dependency-free .npz fallback for host-local snapshots

``save_env`` / ``load_env`` capture an Environment's full mutable state.
``save_state`` / ``load_state`` operate on a raw pytree (e.g. inside a
training loop that owns its own state).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_env", "load_env", "save_state", "load_state"]

_SCALAR_KEY = "__leaf__"


def _flatten_with_paths(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_state(state: Any, path: str) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz, host-local)."""
    leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(template: Any, path: str) -> Any:
    """Load a pytree saved by :func:`save_state`; ``template`` supplies the
    structure (and dtypes, which are enforced on the loaded leaves)."""
    leaves, treedef = _flatten_with_paths(template)
    data = np.load(path)
    assert len(data.files) == len(leaves), (
        f"checkpoint has {len(data.files)} leaves, template has {len(leaves)} "
        "(scenario config must match the one checkpointed)"
    )
    new_leaves = []
    for i, l in enumerate(leaves):
        loaded = data[f"leaf_{i}"]
        tmpl = jnp.asarray(l)
        assert loaded.shape == tmpl.shape, (
            f"checkpoint leaf {i} has shape {loaded.shape}, template expects "
            f"{tmpl.shape} (scenario config must match the one checkpointed)"
        )
        new_leaves.append(jnp.asarray(loaded, tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_env(env, path: str) -> None:
    """Snapshot an Environment's full mutable state (world state pytree,
    step counters, PRNG key)."""
    save_state({"state": env.state, "steps": env.steps, "key": env._key}, path)


def load_env(env, path: str) -> None:
    """Restore a snapshot taken by :func:`save_env` into ``env`` (must be
    built with the same scenario config)."""
    restored = load_state(
        {"state": env.state, "steps": env.steps, "key": env._key}, path
    )
    env.state = restored["state"]
    env.steps = restored["steps"]
    env._key = restored["key"]


def save_state_orbax(state: Any, path: str) -> None:
    """Orbax backend: sharding-aware checkpoint for multi-host meshes."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)


def load_state_orbax(template: Any, path: str) -> Any:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.abspath(path), item=template)
