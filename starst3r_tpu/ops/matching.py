"""Reciprocal nearest-neighbor descriptor matching on a subsampled grid.

TPU-native replacement for mast3r's CUDA `fast_reciprocal_NNs` matching
(SURVEY §2b "Pairwise inference + cache" row; subsample spec: reference
starster/reconstruct.py:80 `subsample=8`).

Design: descriptors are sampled every ``subsample`` pixels (grid anchored at
``subsample // 2``, the anchor-grid convention also used by the alignment's
core-depth). The full similarity matrix between the two grids is ONE matmul
— exactly what the MXU wants (784×784×D at 224px, 4096×4096×D at 512px) —
followed by row/col argmax and a mutual-consistency check. Everything is
static-shape: outputs are fixed length n1 with a validity mask.

Correspondence confidence: sqrt(conf1[p1] * conf2[p2]) of the **pointmap**
confidences (range [1, inf)), so the reference's matching_conf_thr=5
(reconstruct.py:67) keeps its semantics when deciding pair quality.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ("PairMatches", "subsample_grid_indices", "reciprocal_nn",
           "match_pair")


class PairMatches(NamedTuple):
    """Fixed-size match set for one ordered pair (i -> j).

    All arrays have length n1 = number of grid points in image i.
    ``idx1[k]`` is k itself (grid index in image i), ``idx2[k]`` the matched
    grid index in image j, valid where ``mask``.
    """

    idx1: jnp.ndarray   # (n1,) int32
    idx2: jnp.ndarray   # (n1,) int32
    conf: jnp.ndarray   # (n1,) float32 — 0 where invalid
    mask: jnp.ndarray   # (n1,) bool
    sim: jnp.ndarray    # (n1,) float32 descriptor similarity of the match


def subsample_grid_indices(h: int, w: int, subsample: int) -> Tuple[jnp.ndarray, int, int]:
    """Flat pixel indices of the anchor grid: pixels (subsample//2 + k*s).

    Returns (flat_idx (hs*ws,), hs, ws).
    """
    off = subsample // 2
    ys = jnp.arange(off, h, subsample)
    xs = jnp.arange(off, w, subsample)
    hs, ws = ys.shape[0], xs.shape[0]
    flat = (ys[:, None] * w + xs[None, :]).reshape(-1)
    return flat.astype(jnp.int32), hs, ws


@functools.partial(jax.jit, static_argnames=("subsample",))
def match_pair(desc1: jnp.ndarray, desc2: jnp.ndarray,
               conf1: jnp.ndarray, conf2: jnp.ndarray,
               subsample: int = 8) -> PairMatches:
    """Match two descriptor maps on the subsample grid.

    desc1/desc2: (H, W, D) L2-normalized descriptors.
    conf1/conf2: (H, W) pointmap confidences.
    """
    h, w, d = desc1.shape
    grid, hs, ws = subsample_grid_indices(h, w, subsample)
    d1 = desc1.reshape(h * w, d)[grid]       # (n1, D)
    d2 = desc2.reshape(h * w, d)[grid]       # (n2, D)
    c1 = conf1.reshape(h * w)[grid]
    c2 = conf2.reshape(h * w)[grid]
    return reciprocal_nn(d1, d2, c1, c2)


def reciprocal_nn(d1: jnp.ndarray, d2: jnp.ndarray,
                  c1: jnp.ndarray, c2: jnp.ndarray) -> PairMatches:
    """Mutual nearest neighbors between two descriptor sets.

    d1: (n1, D), d2: (n2, D) — similarity is the dot product (descriptors are
    unit-norm so this is cosine similarity).
    """
    n1 = d1.shape[0]
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)  # (n1, n2)
    nn12 = jnp.argmax(sim, axis=1)            # (n1,) best j for each i
    nn21 = jnp.argmax(sim, axis=0)            # (n2,) best i for each j
    mutual = nn21[nn12] == jnp.arange(n1)
    best_sim = jnp.max(sim, axis=1)
    conf = jnp.sqrt(jnp.maximum(c1 * c2[nn12], 0.0))
    conf = jnp.where(mutual, conf, 0.0)
    return PairMatches(
        idx1=jnp.arange(n1, dtype=jnp.int32),
        idx2=nn12.astype(jnp.int32),
        conf=conf.astype(jnp.float32),
        mask=mutual,
        sim=jnp.where(mutual, best_sim, -jnp.inf).astype(jnp.float32),
    )
