"""Pytree checkpointing for scene parameters and optimizer state.

Dependency-light: pytrees are flattened to leaves stored in a single .npz
plus the key-path layout; restore rebuilds against a template pytree (the
standard JAX pattern — the template supplies structure, the file supplies
leaves). Used by the inverse-rendering loop for resumable optimization
(SURVEY.md §5 checkpoint/resume; the reference has none).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _leaf_paths(tree):
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in leaves}


def save_pytree(path, tree, extra: dict | None = None) -> Path:
    """Save a pytree's leaves (and optional scalar metadata) to ``path``.

    Returns the path actually written: np.savez appends ``.npz`` when the
    suffix is missing, and the return value must name the real file."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {f"leaf::{k}": np.asarray(v) for k, v in _leaf_paths(tree).items()}
    for k, v in (extra or {}).items():
        payload[f"extra::{k}"] = np.asarray(v)
    np.savez(path, **payload)
    return path


def load_pytree(path, template, with_extra: bool = False):
    """Restore a pytree saved by :func:`save_pytree` against ``template``
    (same structure; leaf dtypes follow the template)."""
    data = np.load(path)
    stored = {k[len("leaf::"):]: data[k] for k in data.files if k.startswith("leaf::")}
    paths = jax.tree_util.tree_leaves_with_path(template)
    missing = [jax.tree_util.keystr(p) for p, _ in paths if jax.tree_util.keystr(p) not in stored]
    if missing:
        raise KeyError(f"checkpoint missing leaves: {missing}")
    # Shape check against the template: a same-named checkpoint from a
    # different config (other num_cameras pose, other MLP width) would
    # otherwise surface later as an opaque XLA shape error — or train
    # silently wrong if broadcastable.
    bad = [
        (jax.tree_util.keystr(p), stored[jax.tree_util.keystr(p)].shape,
         np.shape(leaf))
        for p, leaf in paths
        if stored[jax.tree_util.keystr(p)].shape != np.shape(leaf)
    ]
    if bad:
        raise ValueError(
            "checkpoint leaf shapes do not match the template: "
            + ", ".join(f"{k}: stored {s} != template {t}" for k, s, t in bad)
        )
    leaves = [
        np.asarray(stored[jax.tree_util.keystr(p)], dtype=np.asarray(leaf).dtype)
        for p, leaf in paths
    ]
    tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
    if with_extra:
        extra = {
            k[len("extra::"):]: data[k] for k in data.files if k.startswith("extra::")
        }
        return tree, extra
    return tree


# --- orbax backend (multihost-safe) ------------------------------------------
#
# The npz path above is single-host: every process would race on one file.
# On pods, orbax-checkpoint provides atomic, multihost-coordinated pytree
# checkpoints (each host writes its shards; host 0 commits). Same
# template-supplies-structure contract as load_pytree.


def save_pytree_orbax(directory, tree, extra: dict | None = None) -> Path:
    """Save a pytree with orbax (atomic, multihost-coordinated).

    ``directory`` must be a fresh or nonexistent directory per checkpoint
    (orbax commits atomically via rename). ``extra`` scalars ride along as
    a side pytree."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            directory,
            {"tree": tree, "extra": {k: np.asarray(v) for k, v in (extra or {}).items()}},
        )
    return directory


def load_pytree_orbax(directory, template, with_extra: bool = False):
    """Restore an orbax checkpoint against ``template`` (structure and
    leaf dtypes from the template, like :func:`load_pytree`)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(directory)
    stored = restored["tree"]
    flat_stored, _ = jax.tree_util.tree_flatten(stored)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    if len(flat_stored) != len(paths):
        raise ValueError(
            f"checkpoint has {len(flat_stored)} leaves, template has "
            f"{len(paths)}"
        )
    bad = [
        (jax.tree_util.keystr(p), np.shape(s), np.shape(leaf))
        for s, (p, leaf) in zip(flat_stored, paths)
        if np.shape(s) != np.shape(leaf)
    ]
    if bad:
        raise ValueError(
            "checkpoint leaf shapes do not match the template: "
            + ", ".join(f"{k}: stored {s} != template {t}" for k, s, t in bad)
        )
    leaves = [
        np.asarray(s, dtype=np.asarray(leaf).dtype)
        for s, (_, leaf) in zip(flat_stored, paths)
    ]
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    if with_extra:
        return tree, dict(restored.get("extra") or {})
    return tree
