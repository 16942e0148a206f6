"""Checkpoint/resume for simulation and training state.

The reference has no checkpointing at all (SURVEY.md §5) — episodes restart
via reset(poses). Here every piece of state is a pytree, so checkpointing is
a first-class capability: save/restore any pytree (SimState batches, PPO
TrainState, plain dicts) with orbax when available, else a portable .npz
fallback with identical semantics.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree: Any) -> str:
    """Save any pytree to ``path`` (.npz archive + pickled treedef).

    Device arrays are pulled to host; dtypes/shapes preserved exactly.
    """
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, __treedef__=np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8), **arrays)
    return path


def load_pytree(path: str, device: bool = True) -> Any:
    """Load a pytree saved by save_pytree. device=True puts leaves on the
    default device (as jax arrays); False returns numpy."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    if device:
        leaves = [jax.numpy.asarray(x) for x in leaves]
    return jax.tree.unflatten(treedef, leaves)


def save_orbax(path: str, tree: Any) -> str:
    """Save with orbax-checkpoint (sharding-aware; for multi-host use)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_orbax(path: str, target: Any) -> Any:
    """Restore an orbax checkpoint into the structure of ``target``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)
