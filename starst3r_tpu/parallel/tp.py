"""Tensor parallelism for the two-view ViT (SURVEY §2c "Tensor parallel"
row; reference has none — single torch device, main.py:15).

Megatron-style sharding expressed purely as parameter PartitionSpecs: the
hidden (output) dim of every attention/MLP input projection is split over
the ``model`` mesh axis and the following output projection contracts over
it, so XLA inserts exactly one psum per attention / per MLP block. No
module changes — GSPMD propagates the layouts through the whole forward;
everything not matched by a rule is replicated.

Rules over flax param paths (models/vit.py):
  attn qkv / cross q,k,v   kernel (d_in, d_h)  -> P(None, "model"),
                           bias   (d_h,)       -> P("model")
  attn/cross out proj      kernel (d_h, d_out) -> P("model", None),
                           bias replicated (added after the psum)
  mlp fc1                  kernel -> P(None, "model"), bias -> P("model")
  mlp fc2                  kernel -> P("model", None), bias replicated

Composes with pair-parallel inference on a 2D ('data', 'model') mesh: the
image batch is sharded over 'data' (parallel/distributed.pair_sharding)
while every matmul's hidden dim is sharded over 'model'.

Note on the packed qkv projection: its feature layout is [3, heads, hd]
(vit.py Attention reshape), so an m-way shard of the 3*dim feature dim is
head-aligned iff m divides dim/hd*3 chunk-wise; GSPMD remains correct for
any m (it reshards around the reshape), head-aligned m just avoids the
extra collective. Prefer model axis sizes that divide the head count.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ("tp_param_specs", "tp_shard_params")

# (path-suffix, leaf-name) -> spec factory. Matched against the flax path
# joined with '/'; first hit wins. "fc1"/"fc2" cover both the transformer
# Mlp blocks and the descriptor head's MLP (same column/row pattern).
_COL = ("attn/qkv", "cross_attn/q", "cross_attn/k", "cross_attn/v",
        "fc1")                         # column-parallel: split output dim
_ROW = ("attn/proj", "cross_attn/proj", "fc2")      # row-parallel: split in


def _spec_for(path: str, leaf_name: str, ndim: int, axis: str):
    for pat in _COL:
        if path.endswith(pat):
            if leaf_name == "kernel" and ndim == 2:
                return P(None, axis)
            if leaf_name == "bias" and ndim == 1:
                return P(axis)
    for pat in _ROW:
        if path.endswith(pat):
            if leaf_name == "kernel" and ndim == 2:
                return P(axis, None)
            # bias is added AFTER the contraction psum -> replicate
    return P()


def tp_param_specs(params: Any, axis: str = "model") -> Any:
    """Pytree of PartitionSpec (same structure as ``params``) implementing
    the Megatron column/row split over mesh axis ``axis``."""

    def one(path_tuple, leaf):
        keys = [getattr(p, "key", str(p)) for p in path_tuple]
        path = "/".join(keys[:-1])
        return _spec_for(path, keys[-1], getattr(leaf, "ndim", 0), axis)

    return jax.tree_util.tree_map_with_path(one, params)


def tp_shard_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place ``params`` on ``mesh`` with the TP layout. Dims that do not
    divide the axis size fall back to replication (tiny test models)."""
    axis_size = mesh.shape[axis]

    def place(spec, leaf):
        for dim, name in enumerate(spec):
            if name == axis and leaf.shape[dim] % axis_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    specs = tp_param_specs(params, axis)
    return jax.tree_util.tree_map(place, specs, params)
