"""Checkpoint/resume for simulation and training state.

The reference has no checkpointing at all (SURVEY.md §5) — episodes restart
via reset(poses). Here every piece of state is a pytree, so checkpointing is
a first-class capability: save/restore any pytree (SimState batches, PPO
TrainState, plain dicts) with orbax when available, else a portable .npz
fallback with identical semantics.

Security note: a pytree's STRUCTURE (treedef) can contain arbitrary node
types, so the .npz stores it pickled. ``load_pytree(path, target=...)``
restores into the caller-supplied structure WITHOUT ever unpickling —
use that form for untrusted files. The convenience no-target form
unpickles the stored treedef and must only be used on trusted
checkpoints (it refuses unless ``allow_pickle=True`` is passed).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> str:
    """Save any pytree to ``path`` (.npz archive: leaves + key paths +
    pickled treedef).

    Device arrays are pulled to host; dtypes/shapes preserved exactly.
    """
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {
        f"leaf_{i}": np.asarray(leaf)
        for i, (_, leaf) in enumerate(leaves_with_path)
    }
    keypaths = np.array(
        [jax.tree_util.keystr(kp) for kp, _ in leaves_with_path]
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, __treedef__=np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8),
        __keypaths__=keypaths, **arrays)
    return path


def load_pytree(path: str, target: Optional[Any] = None, device: bool = True,
                allow_pickle: bool = False) -> Any:
    """Load a pytree saved by save_pytree.

    target: a pytree with the expected structure (e.g. a freshly-built
    TrainState). When given, leaves are restored into ITS treedef after
    checking leaf key paths match — nothing is unpickled, so this form is
    safe on untrusted files. Without a target the stored treedef is
    unpickled, which executes arbitrary constructors: pass
    ``allow_pickle=True`` to acknowledge the file is trusted.

    device=True puts leaves on the default device (as jax arrays); False
    returns numpy.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        keypaths = (list(z["__keypaths__"])
                    if "__keypaths__" in z.files else None)
        treedef_bytes = z["__treedef__"].tobytes()
    if device:
        leaves = [jax.numpy.asarray(x) for x in leaves]
    if target is not None:
        t_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
        if len(t_paths) != n:
            raise ValueError(
                f"checkpoint has {n} leaves but target has {len(t_paths)}")
        if keypaths is not None:
            want = [jax.tree_util.keystr(kp) for kp, _ in t_paths]
            got = [str(k) for k in keypaths]
            if want != got:
                bad = next(
                    (i for i, (w, g) in enumerate(zip(want, got)) if w != g))
                raise ValueError(
                    f"checkpoint structure mismatch at leaf {bad}: "
                    f"file has {got[bad]!r}, target has {want[bad]!r}")
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if not allow_pickle:
        raise ValueError(
            "load_pytree without a target must unpickle the stored tree "
            "structure; pass target=<template pytree> (safe) or "
            "allow_pickle=True if this checkpoint is trusted")
    treedef = pickle.loads(treedef_bytes)
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
