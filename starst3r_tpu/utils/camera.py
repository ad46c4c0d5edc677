"""Pinhole camera math: intrinsics, projection, unprojection, focal
estimation from pointmaps.

These are the jnp equivalents of the mast3r geometry helpers the reference
consumes via star-import (call sites: starster/reconstruct.py:14,320,366,380;
SURVEY §2b "Helpers" row). All functions are shape-polymorphic over leading
batch dims and jit/vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = (
    "make_intrinsics",
    "pixel_grid",
    "unproject_depth",
    "project_points",
    "reproj2d",
    "estimate_focal_from_pointmap",
)


def make_intrinsics(focal, pp, dtype=jnp.float32):
    """focal (...,) or (...,1); pp (...,2) in pixels -> K (..., 3, 3)."""
    focal = jnp.asarray(focal, dtype)
    if focal.ndim and focal.shape[-1] == 1:
        focal = focal[..., 0]
    pp = jnp.asarray(pp, dtype)
    batch = focal.shape
    K = jnp.zeros(batch + (3, 3), dtype)
    K = K.at[..., 0, 0].set(focal)
    K = K.at[..., 1, 1].set(focal)
    K = K.at[..., 0, 2].set(pp[..., 0])
    K = K.at[..., 1, 2].set(pp[..., 1])
    K = K.at[..., 2, 2].set(1.0)
    return K


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """(h*w, 2) pixel centers (x, y) in raster order."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)


def unproject_depth(depth, K, c2w=None, pix=None):
    """depth (..., N) + K (..., 3, 3) [+ pixels (..., N, 2)] -> points.

    Returns camera-frame points (..., N, 3); if ``c2w`` (..., 4, 4) is given,
    world-frame points.
    """
    if pix is None:
        raise ValueError("pix required (use pixel_grid)")
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (pix[..., 0] - cx) / fx * depth
    y = (pix[..., 1] - cy) / fy * depth
    pts = jnp.stack([x, y, depth], axis=-1)
    if c2w is not None:
        R = c2w[..., :3, :3]
        t = c2w[..., :3, 3]
        pts = jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return pts


def project_points(pts, K, w2c=None, eps: float = 1e-8):
    """World/camera points (..., N, 3) -> pixel coords (..., N, 2) + depth.

    If ``w2c`` is given, pts are world-frame and get transformed first.
    """
    if w2c is not None:
        R = w2c[..., :3, :3]
        t = w2c[..., :3, 3]
        pts = jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    z = pts[..., 2]
    zc = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    u = fx * pts[..., 0] / zc + cx
    v = fy * pts[..., 1] / zc + cy
    return jnp.stack([u, v], axis=-1), z


def reproj2d(proj_matrix, pts3d, eps: float = 1e-8):
    """3x4 projection matrix (K @ w2c[:3]) applied to (N, 3) points -> (N, 2)
    pixels (reference helper `reproj2d`, call site reconstruct.py:366)."""
    homo = proj_matrix[..., :3, :3] @ pts3d[..., None]
    homo = homo[..., 0] + proj_matrix[..., :3, 3]
    z = homo[..., 2:3]
    zc = jnp.where(jnp.abs(z) < eps, eps, z)
    return homo[..., :2] / zc


def estimate_focal_from_pointmap(pts3d, pp, conf=None, eps: float = 1e-8):
    """Closed-form (Weiszfeld-free) focal estimate from a camera-frame
    pointmap — the dust3r-style `estimate_focal_knowing_depth` analog
    (SURVEY §2b "Canonical data prep" row).

    pts3d: (H, W, 3) camera-frame pointmap; pp: (2,) principal point px.
    Returns scalar focal: confidence-weighted median of the per-pixel focal
    consistent with the projection  u - cx = f * X/Z.
    """
    h, w = pts3d.shape[:2]
    pix = pixel_grid(h, w).reshape(h, w, 2)
    du = pix - pp  # (H, W, 2)
    z = pts3d[..., 2]
    xy = pts3d[..., :2]
    # per-pixel least-squares f = (du . xy/z) / (||xy/z||^2), aggregated
    ratio = xy / jnp.where(jnp.abs(z[..., None]) < eps, eps, z[..., None])
    num = jnp.sum(du * ratio, axis=-1)
    den = jnp.sum(ratio * ratio, axis=-1)
    if conf is not None:
        wgt = conf
    else:
        wgt = jnp.ones_like(num)
    # weighted global least squares over all pixels (robust enough with conf)
    f = jnp.sum(wgt * num) / jnp.maximum(jnp.sum(wgt * den), eps)
    return jnp.maximum(f, eps)
