"""Pytree checkpointing: save/restore of model weights, GA warm-start
params, and Gaussian state.

The reference's checkpoint story (SURVEY §5 "Checkpoint / resume" row) has
three load-bearing pieces we reproduce:
  (a) model weights load               (reference: main.py:46)
  (b) GA optimizer warm-start params   (reference: reconstruct.py:408-415)
  (c) per-pair inference disk cache    (reference: scene.py:60-62) —
      handled by io/cache.py.

Format: a single .npz per checkpoint with flattened path keys + a JSON
treedef sidecar entry, so restores are self-describing and need no
framework-specific deserializer. Orbax remains usable for large sharded
checkpoints via `save_orbax`/`restore_orbax`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

__all__ = ("save_pytree", "restore_pytree", "tree_prefix_overwrite",
           "load_flat", "group_flat")

_SEP = "/"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    flat = _flatten(tree)
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    # record structure for reconstruction; write through a file handle so
    # np.savez cannot append ".npz" to extension-less paths like scene.ckpt
    structure = jax.tree_util.tree_structure(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __treedef__=np.frombuffer(
            json.dumps(str(structure)).encode(), dtype=np.uint8), **flat)
    os.replace(tmp, path)


def restore_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of ``like`` (shapes/keys must match the
    saved tree; dtype follows the saved arrays)."""
    with np.load(path, allow_pickle=False) as data:
        flat_saved = {k: data[k] for k in data.files if k != "__treedef__"}
    paths_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_like, leaf in paths_like:
        key = _SEP.join(_path_str(p) for p in path_like)
        if key not in flat_saved:
            raise KeyError(f"checkpoint {path!r} missing leaf {key!r}")
        leaves.append(flat_saved[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_flat(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint as a flat {path-key: array} dict (no ``like`` tree
    needed — the keyed access the CLI uses)."""
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files if k != "__treedef__"}


def group_flat(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Sub-dict of keys under ``prefix + '/'``, with the prefix stripped."""
    p = prefix + _SEP
    return {k[len(p):]: v for k, v in flat.items() if k.startswith(p)}


def tree_prefix_overwrite(new_tree: Any, prev_tree: Any, axis: int = 0) -> Any:
    """Overwrite the leading entries of every leaf in ``new_tree`` with the
    corresponding leaf of ``prev_tree`` along ``axis``.

    This is the TPU-native form of the reference's SLAM warm-start: "if more
    cameras were added, only the first N params are set to prev_params"
    (reference: starster/reconstruct.py:136-147,408-415). Leaves whose other
    dims differ (e.g. padded depth grids) are overwritten over the common
    slice.
    """
    def _merge(new, prev):
        if prev is None:
            return new
        new = jax.numpy.asarray(new)
        prev = jax.numpy.asarray(prev)
        n = min(new.shape[axis], prev.shape[axis])
        common = tuple(slice(0, min(a, b)) for a, b in
                       zip(new.shape, prev.shape))
        idx = list(common)
        idx[axis] = slice(0, n)
        return new.at[tuple(idx)].set(prev[tuple(idx)])

    return jax.tree_util.tree_map(_merge, new_tree, prev_tree)
