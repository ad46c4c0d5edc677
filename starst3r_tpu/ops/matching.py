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
           "match_pair", "refine_matches")


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


@functools.partial(jax.jit, static_argnames=("subsample",))
def refine_matches(desc1: jnp.ndarray, desc2: jnp.ndarray,
                   m: PairMatches, subsample: int = 8
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-accurate refinement of grid-level matches.

    The reference's operative matcher (mast3r fast_reciprocal_NNs) returns
    FULL-RESOLUTION pixel matches which sparse_ga then anchors to the core
    grid with a per-match depth offset (reference call-site
    reconstruct.py:380); grid-level matching alone snaps endpoints by up to
    subsample/2 px, which dominated the GA's ATE (VERDICT r3 #5). This
    refinement searches each match's (subsample+1)^2 full-res neighborhood
    for the best descriptor response, cutting the snap quantum from
    subsample/2 (4 px at the default 8) to 0.5 px.

    For every match k: pix2[k] = argmax over the window centered on
    idx2[k]'s grid pixel of <desc1[idx1 grid pixel], desc2[window]>; then
    pix1[k] = argmax over idx1's window of <desc2[pix2[k]], desc1[window]>
    — CHAINED, so (pix1[k], pix2[k]) is one geometrically consistent
    correspondence (refining each side against the other's GRID pixel
    would yield two different correspondences offset by twice the true
    sub-cell displacement). One (n, W2, D) gather + batched dot per side —
    static shapes, MXU/VPU friendly.

    Returns (pix1 (n,2), pix2 (n,2)) float32 (x, y) pixel coordinates.
    """
    h, w, d = desc1.shape
    grid, _hs, _ws = subsample_grid_indices(h, w, subsample)
    r = subsample // 2
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")
    offs_y = dy.reshape(-1)
    offs_x = dx.reshape(-1)                       # (W2,)
    gx = grid % w
    gy = grid // w

    def one_side(q, ctr_y, ctr_x, tgt_desc_flat):
        # q (n, D) query descriptors; ctr_* (n,) window centers
        cy = jnp.clip(ctr_y[:, None] + offs_y[None, :], 0, h - 1)
        cx = jnp.clip(ctr_x[:, None] + offs_x[None, :], 0, w - 1)
        flat = (cy * w + cx).reshape(-1)
        cand = tgt_desc_flat[flat].reshape(q.shape[0], -1, d)
        sim = jnp.einsum("nd,nwd->nw", q, cand,
                         precision=jax.lax.Precision.HIGHEST)
        best = jnp.argmax(sim, axis=1)
        by = jnp.take_along_axis(cy, best[:, None], 1)[:, 0]
        bx = jnp.take_along_axis(cx, best[:, None], 1)[:, 0]
        return by, bx

    d1f = desc1.reshape(h * w, d)
    d2f = desc2.reshape(h * w, d)
    q1 = d1f[grid[m.idx1]]                        # (n, D)
    p2y, p2x = one_side(q1, gy[m.idx2], gx[m.idx2], d2f)
    q2 = d2f[p2y * w + p2x]                       # refined-side query
    p1y, p1x = one_side(q2, gy[m.idx1], gx[m.idx1], d1f)
    pix1 = jnp.stack([p1x, p1y], -1).astype(jnp.float32)
    pix2 = jnp.stack([p2x, p2y], -1).astype(jnp.float32)
    return pix1, pix2
