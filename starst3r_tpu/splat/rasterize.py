"""Differentiable 3D Gaussian Splatting rasterizer for TPU.

TPU-native replacement for the gsplat CUDA rasterizer the reference calls
(reference: starster/gs.py:76-87; SURVEY §2b "gsplat rasterizer" row). The
CUDA pipeline (project -> 16x16 tile binning via sorted intersection lists ->
depth-sorted front-to-back alpha compositing) is re-designed for XLA:

  1. projection / conics / SH eval: batched jnp — lands on MXU/VPU;
  2. tile binning WITHOUT atomics: each Gaussian emits a static number of
     (tile_id, depth, gauss_idx) candidate entries (a KxK tile window around
     its center, K from `max_tiles_per_gaussian`); one `jax.lax.sort` with 2
     keys orders them by (tile, depth); per-tile segments come from
     searchsorted — all static shapes;
  3. compositing: per tile, gather up to `max_per_tile` depth-ordered
     entries and alpha-composite front-to-back. THREE interchangeable
     implementations, strongest first:
       'pallas' (default on TPU): fused forward + analytic-reverse-sweep
           backward kernels, per-tile count-bounded loops with
           transmittance early exit (pallas_composite.py);
       'xla': chunked `while_loop` with a hand-derived reverse-sweep VJP
           (_composite_xla) — identical semantics, runs everywhere;
       'ref': pure-XLA scan with autodiff backward — the parity oracle.
     The reverse-order accumulation the CUDA kernel hand-codes (SURVEY
     §7.4 hard part 1) is hand-derived here too and cross-checked against
     the oracle to 1e-5 (tests/test_splat.py, tests/test_pallas_composite).

PERFORMANCE NOTE (r5 roofline analysis, tools/probe_profile_step.py +
bench aux splat_roofline): the train step is bound by the two entry
gathers — forward (C,T,K) slot rows and backward E rows per pool slot —
each of which costs one (8,128) 4 KB tile read per row on TPU
irrespective of the 36 B payload. Measured at bench scale the gathers
run at 58%/73% of that tile-read bound (step_tile_model_frac 0.36
at 50k, 0.47 at 1M), i.e. the design is near ITS OWN speed of light;
the remaining headroom is FEWER gathered rows. At 50k/224px occupancy
is 29% (rectangular slots 1.61M vs 0.57M chunk-aligned entries → a
compact/bucketed entry layout projects ~1.4x on the whole step), while
at the 1M operating point occupancy is already 96% and compaction buys
nothing. Capping max_per_tile below max occupancy (e.g. 512) is 1.43x
faster but measurably changes renders on overdraw-heavy scenes (dropped
depth-later entries can be the only cover for some pixels) — kept as an
explicit user knob, not a default.

Semantics match `gsplat.rasterization(means, quats(wxyz), scales, opacities,
colors(N,K,3), viewmats, Ks, width, height, sh_degree)`: scales/opacities are
consumed in linear space (the reference feeds raw parameters — SURVEY §2a
quirk 3 — reproduced by `compat_raw_activations`), SH degree selects the
first (deg+1)^2 color bands, rendering returns (rgb (C,H,W,3),
alpha (C,H,W,1), info).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ("Bins", "bin_gaussians", "project_gaussians", "rasterize",
           "sh_eval")

_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199


def quat_to_rotmat_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    """Local copy of quat->rotmat for (N, 4) wxyz (kept here so the splat
    module depends only on jnp)."""
    # sqrt(sum+eps) (not norm+clamp): jnp.linalg.norm's VJP is NaN at 0 even
    # when a later maximum() discards the branch
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def sh_eval(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Spherical harmonics -> RGB. sh: (N, K, 3) with K >= (degree+1)^2;
    dirs: (N, 3) unit view directions. Matches gsplat's convention
    (+0.5 offset, clipped at 0)."""
    c = _SH_C0 * sh[:, 0]
    if degree >= 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        c = c + _SH_C1 * (-y * sh[:, 1] + z * sh[:, 2] - x * sh[:, 3])
    return jnp.maximum(c + 0.5, 0.0)


class Projected(NamedTuple):
    means2d: jnp.ndarray   # (N, 2)
    depths: jnp.ndarray    # (N,)
    conics: jnp.ndarray    # (N, 3) upper-triangular inverse 2D covariance
    radii: jnp.ndarray     # (N,)
    colors: jnp.ndarray    # (N, 3)
    opacities: jnp.ndarray  # (N,)
    valid: jnp.ndarray     # (N,) bool


def project_gaussians(means, quats, scales, opacities, sh, w2c, K,
                      sh_degree: int = 1, eps2d: float = 0.3,
                      near: float = 0.01) -> Projected:
    """Project all Gaussians into one camera. All args batched over N."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    cam_pts = means @ R.T + t                       # (N, 3)
    # clamp to a generous world box: runaway Gaussians (e.g. MCMC noise
    # excursions) otherwise overflow the conic algebra to inf, and
    # inf - inf = NaN poisons the whole Adam state through the backward
    cam_pts = jnp.clip(cam_pts, -1e5, 1e5)
    z = cam_pts[:, 2]
    valid = z > near

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    zc = jnp.maximum(z, near)
    u = fx * cam_pts[:, 0] / zc + cx
    v = fy * cam_pts[:, 1] / zc + cy
    means2d = jnp.stack([u, v], -1)

    # 2D covariance cov2d = J W (M M^T) W^T J^T expanded to ELEMENTWISE
    # f32 formulas on (N,) arrays: the batched tiny-matrix (3x3 / 2x3)
    # matmul chain lowered to bf16 MXU convolutions plus ~13 ms/step of
    # layout copies at bench scale (tools/probe_profile_step.py traces:
    # convolution_bitcast_fusion + (2,128)-tiled copies), and bf16 loses
    # geometry precision; the expansion fuses into one VPU kernel.
    # M = R_q diag(s); M2 = W M, so cov_cam = M2 M2^T (6 unique entries).
    q = quats * jax.lax.rsqrt(jnp.sum(quats * quats, axis=-1,
                                      keepdims=True) + 1e-24)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    # m2[a][k] = sum_b W[a,b] * r_bk * s_k   (W = R, camera scalars)
    m2 = [[(R[a, 0] * rb0 + R[a, 1] * rb1 + R[a, 2] * rb2) * s
           for rb0, rb1, rb2, s in ((r00, r10, r20, s0),
                                    (r01, r11, r21, s1),
                                    (r02, r12, r22, s2))]
          for a in range(3)]
    sig = [[sum(m2[a][k] * m2[b][k] for k in range(3))
            for b in range(3)] for a in range(3)]

    x_, y_ = cam_pts[:, 0], cam_pts[:, 1]
    j00 = fx / zc
    j02 = -fx * x_ / (zc * zc)
    j11 = fy / zc
    j12 = -fy * y_ / (zc * zc)
    a = (j00 * j00 * sig[0][0] + 2 * j00 * j02 * sig[0][2]
         + j02 * j02 * sig[2][2]) + eps2d
    b = (j00 * j11 * sig[0][1] + j00 * j12 * sig[0][2]
         + j02 * j11 * sig[1][2] + j02 * j12 * sig[2][2])
    c = (j11 * j11 * sig[1][1] + 2 * j11 * j12 * sig[1][2]
         + j12 * j12 * sig[2][2]) + eps2d
    det = jnp.maximum(a * c - b * b, 1e-12)
    conics = jnp.stack([c / det, -b / det, a / det], -1)

    # radius: 3 sigma of the larger eigenvalue
    mid = 0.5 * (a + c)
    eig = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 1e-12))
    radii = jnp.ceil(3.0 * jnp.sqrt(eig))
    valid = valid & (det > 1e-12) & (opacities > 1.0 / 255.0)

    # view-dependent color
    cam_pos = -R.T @ t
    dirs = means - cam_pos
    dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, axis=-1,
                                        keepdims=True) + 1e-16)
    colors = sh_eval(sh, dirs, sh_degree)

    return Projected(means2d, z, conics, radii, colors, opacities, valid)


def _depth_bits(t_total: int) -> int:
    """Bits of the packed sort key reserved for quantized depth: the tile id
    (0..t_total inclusive — t_total is the invalid sentinel) takes the high
    bits, depth the rest of the 31 magnitude bits of an int32."""
    tile_bits = max(int(t_total + 1).bit_length(), 1)
    db = 31 - tile_bits
    if db < 8:
        raise ValueError(f"too many tiles ({t_total}) for the packed "
                         "int32 sort key")
    return db


def _bin_gaussians(proj: Projected, tw: int, th: int, tile: int,
                   max_tiles: int, max_per_tile: int):
    """Emit per-Gaussian tile entries, ordered by (tile, depth), with the
    index structure both the forward gather and its backward need.

    Each Gaussian's projected bbox (center ± radius, clipped to the image)
    is enumerated EXACTLY in row-major order up to ``max_tiles`` entries —
    no fixed-window anchoring, so any Gaussian whose bbox fits the budget
    is binned into every tile it touches regardless of radius or position.
    Gaussians whose bbox exceeds the budget keep a sub-window CENTERED on
    their projected mean (full width first, then centered rows; falling
    back to a centered row segment for image-wide footprints) — the
    highest-contribution tiles — instead of the first row-major tiles,
    whose loss blacked out whole tile rows under heavy overdraw (observed
    as tile-aligned holes in the e2e scene, round 5). Truncation is
    COUNTED (returned as ``n_clipped``; surfaced via
    info["n_tiles_clipped"]).

    The (tile, depth) order comes from ONE sort on a PACKED int32 key:
    tile id in the high bits, the top bits of the depth's float32 bit
    pattern in the low bits (positive floats compare like their bit
    patterns, so the quantization keeps exact sign/exponent and >= 8
    mantissa bits — measured 1.2x faster than the 2-key (tile, f32 depth)
    sort at bench scale, tools/probe_projbin_split.py). A second tiny sort
    by Gaussian id carries each entry's (tile*K + slot) position as
    payload, yielding ``bw_idx`` (N, max_tiles): the PRE-COMPOSED gather
    indices that turn the gather backward into a single dense row-gather +
    fixed-length sum — no scatter-add, no L-sized regroup (one composed
    gather measured 4x faster than the two-gather regroup,
    tools/probe_gather_variants.py).

    Returns (sorted_idx (L,), starts (T+1,), bw_idx (N, max_tiles),
    counts (T,), overflow (), n_clipped ()).
    """
    n = proj.means2d.shape[0]
    t_total = tw * th
    tx0 = jnp.floor((proj.means2d[:, 0] - proj.radii) / tile)
    ty0 = jnp.floor((proj.means2d[:, 1] - proj.radii) / tile)
    tx1 = jnp.floor((proj.means2d[:, 0] + proj.radii) / tile)
    ty1 = jnp.floor((proj.means2d[:, 1] + proj.radii) / tile)
    tx0 = jnp.clip(tx0, 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(ty0, 0, th - 1).astype(jnp.int32)
    tx1 = jnp.clip(tx1, 0, tw - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty1, 0, th - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1                                    # (N,) >= 1
    bh = ty1 - ty0 + 1
    area = bw * bh

    # effective (possibly truncated) window: identical to the exact bbox
    # when area <= max_tiles (then bw_eff == bw and bh_eff >= bh); larger
    # bboxes keep full width but only max_tiles//bw rows CENTERED on the
    # projected mean (or a centered row segment when bw alone exceeds the
    # budget) — see the truncation note in the docstring.
    bw_eff = jnp.minimum(bw, max_tiles)
    bh_eff = jnp.maximum(jnp.minimum(bh, max_tiles // bw_eff), 1)
    txc = jnp.clip(jnp.floor(proj.means2d[:, 0] / tile).astype(jnp.int32),
                   tx0, tx1)
    tyc = jnp.clip(jnp.floor(proj.means2d[:, 1] / tile).astype(jnp.int32),
                   ty0, ty1)
    tx0e = jnp.clip(txc - bw_eff // 2, tx0, tx1 - bw_eff + 1)
    ty0e = jnp.clip(tyc - bh_eff // 2, ty0, ty1 - bh_eff + 1)
    area_eff = bw_eff * bh_eff

    e = jnp.arange(max_tiles, dtype=jnp.int32)            # (E,)
    ex = e[None, :] % bw_eff[:, None]                     # (N, E)
    ey = e[None, :] // bw_eff[:, None]
    ty = ty0e[:, None] + ey
    tx = tx0e[:, None] + ex
    ok = proj.valid[:, None] & (e[None, :] < area_eff[:, None])
    tile_id = jnp.where(ok, ty * tw + tx, t_total).astype(jnp.int32)
    n_clipped = jnp.sum((proj.valid & (area > max_tiles)).astype(jnp.int32))

    db = _depth_bits(t_total)
    zbits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depths, 1e-30).astype(jnp.float32), jnp.int32)
    zq = jax.lax.shift_right_logical(zbits, 31 - db)      # (N,) in [0, 2^db)
    key = (jax.lax.shift_left(tile_id, db)
           + jnp.broadcast_to(zq[:, None], tile_id.shape)).reshape(-1)
    flat_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], tile_id.shape).reshape(-1)
    # num_keys=2: lax.sort is UNSTABLE, and the quantized-depth key has
    # many ties (e.g. near-duplicate points from multiple views), so tie
    # order — hence compositing order and training trajectories — varied
    # RUN TO RUN. The Gaussian id as secondary key makes binning (and
    # everything downstream) deterministic.
    sorted_key, sorted_idx = jax.lax.sort((key, flat_idx), num_keys=2)

    starts = jnp.searchsorted(
        sorted_key,
        jax.lax.shift_left(jnp.arange(t_total + 1, dtype=jnp.int32), db))
    raw_counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    counts = jnp.minimum(raw_counts, max_per_tile)
    overflow = jnp.sum(jnp.maximum(raw_counts - max_per_tile, 0))
    max_count = jnp.max(raw_counts)

    # each sorted position's (tile*K + slot) target in the gathered (T, K)
    # layout; entries past a tile's K slots or in the sentinel tile map to
    # the zero row t_total*K. The within-tile slot comes from a cummax
    # over tile-boundary positions — NOT from a starts[t_of] gather: XLA
    # TPU gathers cost a full (8,128) tile read per row regardless of the
    # source size, 12.7 ms for these 1.6M rows at bench scale vs ~1 ms for
    # the scan (tools/probe_profile_step.py).
    l = sorted_key.shape[0]
    s_pos = jnp.arange(l, dtype=jnp.int32)
    t_of = jnp.minimum(
        jax.lax.shift_right_logical(sorted_key, db), t_total - 1)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), t_of[1:] != t_of[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_new, s_pos, 0))
    slot = s_pos - seg_start
    lin = jnp.where((sorted_key < (t_total << db)) & (slot < max_per_tile),
                    t_of * max_per_tile + slot, t_total * max_per_tile)
    # group by owning Gaussian: every Gaussian owns exactly max_tiles
    # entries, so the grouped payload reshapes to (N, max_tiles)
    _, bw_flat = jax.lax.sort((sorted_idx, lin), num_keys=1)
    bw_idx = bw_flat.reshape(n, max_tiles)

    # pre-resolve the per-(tile, slot) sorted-entry positions + validity:
    # they depend only on the binning (NOT on attribute values), so the
    # (tile, slot) -> Gaussian-id gather happens ONCE per rebin — not in
    # every training step (was ~12.7 ms/step at bench scale, profiled
    # tools/probe_profile_step.py). The gather itself runs OUTSIDE the
    # per-camera vmap (_resolve_gidx: one flat gather is 2.3x faster than
    # the batched form), so this function returns (sorted_idx, ent).
    slot_ids = jnp.arange(max_per_tile, dtype=jnp.int32)   # (K,)
    ent = starts[:-1, None] + slot_ids[None, :]            # (T, K)
    ent_valid = ent < starts[1:, None]
    ent = jnp.minimum(ent, l - 1)
    return (sorted_idx, ent, ent_valid, bw_idx, counts, overflow,
            n_clipped, max_count)


def _resolve_gidx(sorted_idx, ent):
    """(C, L) sorted Gaussian ids x (C, T, K) entry positions -> (C, T, K)
    Gaussian ids, as ONE camera-flattened gather (vmapped gathers lower
    per batch element on TPU and run 2.3x slower at bench scale)."""
    c, l = sorted_idx.shape
    ent_g = ent + (jnp.arange(c, dtype=jnp.int32) * l)[:, None, None]
    return sorted_idx.reshape(-1)[ent_g.reshape(-1)].reshape(ent.shape)


@jax.custom_vjp
def _gather_packed(packed, gidx, ent_valid, bw_idx):
    """Global ``packed[gidx] * ent_valid`` with a scatter-free backward.

    GLOBAL = all cameras share one flat gather: packed (C*N, 9) rows are
    indexed by camera-offset ids — a single big gather measured 2.3x
    faster on TPU than the per-camera vmapped form (13.3 vs 5.7 ms at
    bench scale; XLA lowers the vmapped gather per batch element).

    The autodiff VJP of this gather is a scatter-add of C*T*K rows into
    (C*N, 9) — TPU scatters serialize (197 ms at bench scale,
    tools/probe_gather_bwd.py). Instead, ``bw_idx`` (C*N, max_tiles) holds
    each Gaussian's entry positions in the GLOBAL (C*T*K) cotangent
    layout, PRE-COMPOSED by _bin_gaussians' second sort (sentinel row
    C*T*K for dropped entries), so the backward is one dense row-gather
    from the zero-row-padded cotangent plus a fixed-length sum — measured
    4x faster than gathering the L-sized regroup
    (tools/probe_gather_variants.py V2 vs V1: 50 vs 196 ms).

    packed (C*N, 9); gidx (C, T, K) global row ids; ent_valid (C, T, K);
    bw_idx (C*N, E) global cotangent rows. Returns (C, T, K, 9)."""
    c, t, k = gidx.shape
    ga = packed[gidx.reshape(-1)].reshape(c, t, k, packed.shape[-1])
    return jnp.where(ent_valid[..., None], ga, 0.0)


def _gather_packed_fwd(packed, gidx, ent_valid, bw_idx):
    out = _gather_packed(packed, gidx, ent_valid, bw_idx)
    return out, (bw_idx,)


def _gather_packed_bwd(res, g):
    (bw_idx,) = res
    c, t, k, a = g.shape
    g2 = jnp.concatenate(
        [g.reshape(c * t * k, a), jnp.zeros((1, a), g.dtype)], axis=0)
    rows, e = bw_idx.shape
    # accumulate over the E per-Gaussian entry slots with a fori_loop: the
    # one-shot gather materializes a (C*N*E, 9) f32 temp whose 9-wide rows
    # pad to 128 lanes — 14.2x expansion, 15.3 GB at the 1M-Gaussian
    # operating point (the config5 compile OOM, rounds 4-5: "Used 19.41G
    # of 15.75G hbm ... 8.6% utilization"). Chunking caps the temp at
    # (C*N, 9) per slot; the tile reads per gathered row (the actual
    # bandwidth cost) are identical either way.
    def body(i, acc):
        return acc + g2[bw_idx[:, i]]

    d_packed = jax.lax.fori_loop(
        0, e, body, jnp.zeros((rows, a), g.dtype))        # (C*N, 9)
    return d_packed, None, None, None


_gather_packed.defvjp(_gather_packed_fwd, _gather_packed_bwd)


def _globalize_bins(gidx, ent_valid, bw_idx, n: int, max_per_tile: int):
    """Per-camera bin indices -> global flat-gather indices.

    gidx (C,T,K) per-camera Gaussian ids -> rows of the (C*N, 9) packed
    matrix; bw_idx (C,N,E) per-camera (T*K with sentinel T*K) -> rows of
    the global (C*T*K + 1) cotangent (single shared zero row at the end).
    """
    c, t, k = gidx.shape
    cam = jnp.arange(c, dtype=jnp.int32)
    gidx_g = gidx + (cam * n)[:, None, None]
    tk = t * k
    sent = bw_idx >= tk                     # per-camera zero-row sentinel
    bw_g = jnp.where(sent, c * tk, bw_idx + (cam * tk)[:, None, None])
    return gidx_g, ent_valid, bw_g.reshape(c * bw_idx.shape[1],
                                           bw_idx.shape[2])


def _gather_entries(proj_packed, gidx_g, ent_valid, bw_idx_g):
    """Gather per-tile entry attributes from the camera-flattened packed
    attribute matrix.

    All 9 per-Gaussian attributes (mean2d, conic, color, opacity) are packed
    into ONE (C*N, 9) matrix and gathered once globally — measured 2.4x
    faster than four separate gathers (tools/probe_projbin_variants.py) and
    another 2.3x from de-vmapping (see _gather_packed); the unpacking
    slices fuse into the consumers. The (tile, slot) -> Gaussian-id
    resolution (``gidx``/``ent_valid``) is precomputed by `_bin_gaussians`
    (attribute-independent, so it rides the Bins reuse across steps).

    Opacity is validity-masked BEFORE packing (upstream) so stale bins
    (rebinning every N steps) cannot composite a culled Gaussian.

    Returns (g_mean (C,T,K,2), g_conic (C,T,K,3), g_color (C,T,K,3),
    g_op (C,T,K) zeroed beyond each tile's count)."""
    ga = _gather_packed(proj_packed, gidx_g, ent_valid, bw_idx_g)
    g_mean = ga[..., 0:2]
    g_conic = ga[..., 2:5]
    g_color = ga[..., 5:8]
    g_op = ga[..., 8]                                     # (C, T, K)
    return g_mean, g_conic, g_color, g_op


def _composite_tiles(g_mean, g_conic, g_color, g_op, h: int, w: int,
                     tile: int, tw: int, th: int, max_per_tile: int,
                     chunk: int):
    """Front-to-back alpha compositing per tile (XLA reference path; the
    Pallas kernel in pallas_composite.py is the TPU fast path).

    Returns rgb (H, W, 3), alpha (H, W).
    """
    t_total = tw * th

    # pixel coordinates per tile: (T, P=tile*tile, 2)
    ty = jnp.arange(th)
    tx = jnp.arange(tw)
    tile_y0 = jnp.repeat(ty, tw) * tile                   # (T,)
    tile_x0 = jnp.tile(tx, th) * tile
    py = jnp.repeat(jnp.arange(tile), tile)               # (P,)
    px = jnp.tile(jnp.arange(tile), tile)
    pix_x = tile_x0[:, None] + px[None, :] + 0.5          # (T, P)
    pix_y = tile_y0[:, None] + py[None, :] + 0.5

    n_chunks = max_per_tile // chunk

    def chunk_body(carry, s):
        acc_rgb, acc_T = carry                            # (T,P,3), (T,P)
        sl = jax.lax.dynamic_slice_in_dim
        cm = sl(g_mean, s * chunk, chunk, 1)              # (T, c, 2)
        cc = sl(g_conic, s * chunk, chunk, 1)
        ccol = sl(g_color, s * chunk, chunk, 1)
        cop = sl(g_op, s * chunk, chunk, 1)               # (T, c)

        dx = pix_x[:, None, :] - cm[:, :, 0:1]            # (T, c, P)
        dy = pix_y[:, None, :] - cm[:, :, 1:2]
        sigma = (0.5 * (cc[:, :, 0:1] * dx * dx + cc[:, :, 2:3] * dy * dy)
                 + cc[:, :, 1:2] * dx * dy)
        # sigma >= 0 for PSD conics (gsplat skips sigma < 0). Clip BEFORE the
        # exp: exp(-sigma) for large negative sigma overflows to inf in the
        # untaken where-branch and its VJP yields 0 * inf = NaN.
        sigma_c = jnp.clip(sigma, 0.0, 50.0)
        alpha = cop[:, :, None] * jnp.exp(-sigma_c)
        alpha = jnp.where((sigma >= 0.0) & (alpha > 1.0 / 255.0),
                          jnp.minimum(alpha, 0.999), 0.0)

        one_m = 1.0 - alpha                               # (T, c, P)
        # transmittance before each gaussian in the chunk (exclusive cumprod)
        cum = jnp.cumprod(one_m, axis=1)
        cum_excl = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        wgt = alpha * cum_excl * acc_T[:, None, :]        # (T, c, P)
        acc_rgb = acc_rgb + jnp.einsum("tcp,tcd->tpd", wgt, ccol)
        acc_T = acc_T * cum[:, -1]
        return (acc_rgb, acc_T), None

    p = tile * tile
    init = (jnp.zeros((t_total, p, 3), jnp.float32),
            jnp.ones((t_total, p), jnp.float32))
    (rgb_t, trans_t), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, jnp.arange(n_chunks))

    # scatter tiles back into the image
    rgb = rgb_t.reshape(th, tw, tile, tile, 3).transpose(0, 2, 1, 3, 4)
    rgb = rgb.reshape(th * tile, tw * tile, 3)[:h, :w]
    alpha = 1.0 - trans_t.reshape(th, tw, tile, tile).transpose(0, 2, 1, 3)
    alpha = alpha.reshape(th * tile, tw * tile)[:h, :w]
    return rgb, alpha


def _tile_pix(tw: int, th: int, tile: int):
    """Absolute pixel-center coordinates per tile: (T, P) each for x, y."""
    ty = jnp.arange(th)
    tx = jnp.arange(tw)
    tile_y0 = jnp.repeat(ty, tw) * tile                   # (T,)
    tile_x0 = jnp.tile(tx, th) * tile
    py = jnp.repeat(jnp.arange(tile), tile)               # (P,)
    px = jnp.tile(jnp.arange(tile), tile)
    pix_x = tile_x0[:, None] + px[None, :] + 0.5          # (T, P)
    pix_y = tile_y0[:, None] + py[None, :] + 0.5
    return pix_x.astype(jnp.float32), pix_y.astype(jnp.float32)


def _alpha_chunk(cm, cc, cop, pix_x, pix_y):
    """Per-entry alpha over a chunk: cm (T,c,2), cc (T,c,3), cop (T,c),
    pix (T,P). Returns (alpha, raw, expsig, ok, dx, dy) all (T,c,P)."""
    dx = pix_x[:, None, :] - cm[:, :, 0:1]                # (T, c, P)
    dy = pix_y[:, None, :] - cm[:, :, 1:2]
    sigma = (0.5 * (cc[:, :, 0:1] * dx * dx + cc[:, :, 2:3] * dy * dy)
             + cc[:, :, 1:2] * dx * dy)
    # clip BEFORE exp: exp(-sigma) for large negative sigma overflows to inf
    # in the untaken where-branch and its VJP yields 0 * inf = NaN
    expsig = jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    raw = cop[:, :, None] * expsig
    ok = (sigma >= 0.0) & (raw > 1.0 / 255.0)
    alpha = jnp.where(ok, jnp.minimum(raw, 0.999), 0.0)
    return alpha, raw, expsig, ok, dx, dy


def _tri_mats(ch: int):
    """Triangular matmul operators replacing cum{prod,sum} along the chunk
    axis: Linc[i,j]=1 for j<=i (inclusive prefix), Usuf[i,j]=1 for j>=i
    (inclusive suffix). Cumulative ops become (ch,ch)@(ch,P) batched
    matmuls on the MXU — measured 5.3x faster fwd / 2.4x faster bwd than
    XLA's cumprod/cumsum lowering at bench scale (tools/probe_cum_variants).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return ((c <= r).astype(jnp.float32), (c >= r).astype(jnp.float32))


# transmittance saturation threshold for the forward early exit: once EVERY
# pixel's transmittance is below this, remaining (farther) entries cannot
# change the image by more than TEXIT — the loop stops. gsplat's CUDA kernel
# exits per pixel at 1e-4; 1e-6 here keeps the XLA path within the 1e-5
# parity tolerance of the autodiff oracle.
_TEXIT = 1e-6


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _composite_xla(g_mean, g_conic, g_color, g_op, pix_x, pix_y, n_act,
                   chunk: int):
    """Front-to-back compositing with a hand-derived backward.

    Forward is a chunked `while_loop` over depth-ordered entries (carry =
    RGB accumulator + per-pixel transmittance) with TWO data-dependent
    exits the static `scan` could not express:
      - dynamic trip count `n_act` = ceil(max tile occupancy / chunk), so
        compute scales with the scene's real density, not the static
        `max_per_tile` capacity (slots past each tile's count carry
        opacity 0 — skipping them is exact);
      - transmittance saturation (see _TEXIT) — the gsplat early-exit.
    Backward is the gsplat-style reverse sweep (reference call-site
    starster/gs.py:76-87: the CUDA rasterize_to_pixels backward): walk the
    SAME chunks in REVERSE from where the forward stopped, reconstructing
    each entry's incoming transmittance T_j = T_after / suffix_prod(1-a)
    and the suffix color accumulator S_j, yielding exact per-entry
    gradients — no rematerialized autodiff, cost ~1.5x forward.

    Within a chunk, prefix/suffix products ride the MXU as log ->
    triangular matmul -> exp (see _tri_mats).

    g_mean (T,K,2), g_conic (T,K,3), g_color (T,K,3), g_op (T,K) zeroed
    beyond each tile's count; pix_x/pix_y (T,P); n_act float32 scalar
    (non-differentiable chunk count). Returns (rgb (T,P,3), trans (T,P))."""
    rgb, trans, _ = _composite_xla_fwd_loop(g_mean, g_conic, g_color, g_op,
                                            pix_x, pix_y, n_act, chunk)
    return rgb, trans


def _composite_xla_fwd_loop(g_mean, g_conic, g_color, g_op, pix_x, pix_y,
                            n_act, chunk: int):
    t_total, k = g_op.shape
    p = pix_x.shape[1]
    linc, _ = _tri_mats(chunk)
    n_act_i = n_act.astype(jnp.int32)

    def cond(carry):
        s, _, acc_t, t_max = carry
        return (s < n_act_i) & (t_max > _TEXIT)

    def body(carry):
        s, acc_rgb, acc_t, _ = carry                      # (T,P,3), (T,P)
        sl = jax.lax.dynamic_slice_in_dim
        cm = sl(g_mean, s * chunk, chunk, 1)
        cc = sl(g_conic, s * chunk, chunk, 1)
        ccol = sl(g_color, s * chunk, chunk, 1)
        cop = sl(g_op, s * chunk, chunk, 1)
        alpha, _, _, _, _, _ = _alpha_chunk(cm, cc, cop, pix_x, pix_y)
        log_om = jnp.log1p(-alpha)                        # (T, c, P)
        # HIGHEST: default-precision MXU (bf16 inputs) rounds log-space
        # sums by ~0.4% relative — O(0.1) rgb errors at bench scale
        pref = jnp.einsum("ij,tjp->tip", linc, log_om,
                          precision=jax.lax.Precision.HIGHEST)
        cum_excl = jnp.exp(pref - log_om)
        wgt = alpha * cum_excl * acc_t[:, None, :]        # (T, c, P)
        acc_rgb = acc_rgb + jnp.einsum("tcp,tcd->tpd", wgt, ccol,
                                       precision=jax.lax.Precision.HIGHEST)
        acc_t = acc_t * jnp.exp(pref[:, -1, :])
        return (s + 1, acc_rgb, acc_t, jnp.max(acc_t))

    init = (jnp.zeros((), jnp.int32),
            jnp.zeros((t_total, p, 3), jnp.float32),
            jnp.ones((t_total, p), jnp.float32),
            jnp.ones((), jnp.float32))
    s_done, rgb, trans, _ = jax.lax.while_loop(cond, body, init)
    return rgb, trans, s_done


def _composite_xla_fwd(g_mean, g_conic, g_color, g_op, pix_x, pix_y, n_act,
                       chunk: int):
    rgb, trans, s_done = _composite_xla_fwd_loop(
        g_mean, g_conic, g_color, g_op, pix_x, pix_y, n_act, chunk)
    return (rgb, trans), (g_mean, g_conic, g_color, g_op, pix_x, pix_y,
                          trans, s_done)


def _composite_xla_bwd(chunk: int, res, cts):
    g_mean, g_conic, g_color, g_op, pix_x, pix_y, t_fin, s_done = res
    g_rgb, g_trans = cts                                  # (T,P,3), (T,P)
    t_total, k = g_op.shape
    _, usuf = _tri_mats(chunk)
    gt_term = (g_trans * t_fin)[:, None, :]               # (T, 1, P)

    def cond(carry):
        return carry[0] >= 0

    def body(carry):
        s, t_after, s_carry, dm, dc, dcol, dop = carry    # t/s: (T,P)
        sl = jax.lax.dynamic_slice_in_dim
        cm = sl(g_mean, s * chunk, chunk, 1)
        cc = sl(g_conic, s * chunk, chunk, 1)
        ccol = sl(g_color, s * chunk, chunk, 1)
        cop = sl(g_op, s * chunk, chunk, 1)
        alpha, raw, expsig, ok, dx, dy = _alpha_chunk(cm, cc, cop,
                                                      pix_x, pix_y)
        one_m = 1.0 - alpha
        # inclusive suffix product of (1 - alpha) within the chunk (MXU)
        rev_cum = jnp.exp(jnp.einsum(
            "ij,tjp->tip", usuf, jnp.log1p(-alpha),
            precision=jax.lax.Precision.HIGHEST))
        t_j = t_after[:, None, :] / jnp.maximum(rev_cum, 1e-30)  # (T,c,P)
        cdotg = jnp.einsum("tcd,tpd->tcp", ccol, g_rgb,
                           precision=jax.lax.Precision.HIGHEST)
        w_j = alpha * t_j
        contrib = w_j * cdotg
        suf_incl = jnp.einsum("ij,tjp->tip", usuf, contrib,
                              precision=jax.lax.Precision.HIGHEST)
        s_j = (suf_incl - contrib) + s_carry[:, None, :]
        inv_1m = 1.0 / jnp.maximum(one_m, 1e-3)
        # d trans_fin / d alpha_j = -t_fin / (1 - alpha_j)
        dalpha = t_j * cdotg - s_j * inv_1m - gt_term * inv_1m
        # alpha clipped at 0.999 or culled: no grad through sigma/op there
        interior = ok & (raw < 0.999)
        draw = jnp.where(interior, dalpha, 0.0)
        dsigma = -draw * raw                              # (T, c, P)
        a = cc[:, :, 0:1]
        b = cc[:, :, 1:2]
        c_ = cc[:, :, 2:3]
        d_mx = jnp.sum(dsigma * (-(a * dx + b * dy)), axis=2)   # (T, c)
        d_my = jnp.sum(dsigma * (-(c_ * dy + b * dx)), axis=2)
        d_ca = jnp.sum(dsigma * (0.5 * dx * dx), axis=2)
        d_cb = jnp.sum(dsigma * (dx * dy), axis=2)
        d_cc = jnp.sum(dsigma * (0.5 * dy * dy), axis=2)
        d_op = jnp.sum(draw * expsig, axis=2)
        d_col = jnp.einsum("tcp,tpd->tcd", w_j, g_rgb,    # (T, c, 3)
                           precision=jax.lax.Precision.HIGHEST)
        upd = jax.lax.dynamic_update_slice_in_dim
        dm = upd(dm, jnp.stack([d_mx, d_my], -1), s * chunk, 1)
        dc = upd(dc, jnp.stack([d_ca, d_cb, d_cc], -1), s * chunk, 1)
        dcol = upd(dcol, d_col, s * chunk, 1)
        dop = upd(dop, d_op, s * chunk, 1)
        return (s - 1,
                t_after / jnp.maximum(rev_cum[:, 0, :], 1e-30),
                s_carry + suf_incl[:, 0, :],
                dm, dc, dcol, dop)

    init = (s_done - 1, t_fin, jnp.zeros_like(t_fin),
            jnp.zeros_like(g_mean), jnp.zeros_like(g_conic),
            jnp.zeros_like(g_color), jnp.zeros_like(g_op))
    out = jax.lax.while_loop(cond, body, init)
    _, _, _, dm, dc, dcol, dop = out
    return (dm, dc, dcol, dop, jnp.zeros_like(pix_x), jnp.zeros_like(pix_y),
            jnp.zeros((), jnp.float32))


_composite_xla.defvjp(_composite_xla_fwd, _composite_xla_bwd)


def _composite_tiles_xla(g_mean, g_conic, g_color, g_op, counts, h: int,
                         w: int, tile: int, tw: int, th: int, chunk: int):
    """Analytic-VJP compositing over ALL cameras at once.

    g_* are (C, T, K, ...): cameras are folded into the tile axis so one
    while_loop (with one dynamic trip count and one saturation exit)
    serves every camera — bigger batched matmuls for the MXU, no vmapped
    loop skeleton per camera. Returns rgb (C,H,W,3), alpha (C,H,W).
    """
    c, t_total, k = g_op.shape
    pix_x, pix_y = _tile_pix(tw, th, tile)
    p = pix_x.shape[1]
    flat = lambda x: x.reshape((c * t_total,) + x.shape[2:])
    n_act = jnp.ceil(jnp.max(counts).astype(jnp.float32) / chunk)
    rgb_t, trans_t = _composite_xla(
        flat(g_mean), flat(g_conic), flat(g_color), flat(g_op),
        jnp.tile(pix_x, (c, 1)), jnp.tile(pix_y, (c, 1)), n_act, chunk)
    rgb_t = rgb_t.reshape(c, th, tw, tile, tile, 3)
    rgb = rgb_t.transpose(0, 1, 3, 2, 4, 5).reshape(
        c, th * tile, tw * tile, 3)[:, :h, :w]
    trans_t = trans_t.reshape(c, th, tw, tile, tile)
    alpha = 1.0 - trans_t.transpose(0, 1, 3, 2, 4).reshape(
        c, th * tile, tw * tile)[:, :h, :w]
    return rgb, alpha


def _default_impl() -> str:
    """'pallas' (fused fwd+bwd kernels, pallas_composite.py) is the
    default on TPU: exact-parity with the XLA analytic-VJP path and 1.33x
    faster end-to-end at bench scale (train step 58.8 -> 44.4 ms device,
    tools/probe_profile_step.py; shape preconditions fall back to 'xla'
    inside `rasterize` automatically). Elsewhere (CPU tests) 'xla' — the
    Pallas interpreter is far slower than compiled XLA.

    ONE switch: STARST3R_IMPL in {'pallas', 'xla', 'ref'} overrides the
    default. (STARST3R_PALLAS=1/0 is the legacy spelling, still honored:
    1 -> pallas — interpret mode off-TPU — and 0 -> ref.)"""
    import os

    env = os.environ.get("STARST3R_IMPL", "")
    if env in ("pallas", "xla", "ref"):
        return env
    env = os.environ.get("STARST3R_PALLAS", "")
    if env == "1":
        return "pallas"
    if env == "0":
        return "ref"
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


class Bins(NamedTuple):
    """Per-camera tile-binning index structure (no gradients flow through
    it). Computable separately from compositing so training loops can
    REBIN EVERY N STEPS (SplatConfig.rebin_every): camera poses are fixed
    during splat training and tile assignment only drifts as means move,
    so the two sorts amortize across steps while projection (and all
    gradients) stay exact every step."""

    gidx: jnp.ndarray         # (C, T, K) Gaussian id per (tile, slot)
    ent_valid: jnp.ndarray    # (C, T, K) slot occupancy mask
    bw_idx: jnp.ndarray       # (C, N, E) composed backward gather indices
    counts: jnp.ndarray       # (C, T) capped per-tile entry counts
    overflow: jnp.ndarray     # (C,) entries dropped by max_per_tile
    n_clipped: jnp.ndarray    # (C,) Gaussians with bbox > max_tiles
    max_count: jnp.ndarray    # (C,) UNCAPPED max per-tile occupancy


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size"))
def max_bbox_area(means, quats, scales, opacities, sh, viewmats, Ks,
                  width: int, height: int, tile_size: int = 16):
    """Largest tile-bbox area of any valid Gaussian across all cameras —
    the scene's TRUE per-Gaussian tile-budget requirement (used by the
    training loop to pick the smallest power-of-2 `max_tiles_per_gaussian`
    bucket; VERDICT r3: the static budget is the binning cost driver)."""
    tw = -(-width // tile_size)
    th = -(-height // tile_size)

    def pb(w2c, K):
        proj = project_gaussians(means, quats, scales, opacities, sh, w2c,
                                 K, 0)
        tx0 = jnp.clip(jnp.floor(
            (proj.means2d[:, 0] - proj.radii) / tile_size), 0, tw - 1)
        ty0 = jnp.clip(jnp.floor(
            (proj.means2d[:, 1] - proj.radii) / tile_size), 0, th - 1)
        tx1 = jnp.clip(jnp.floor(
            (proj.means2d[:, 0] + proj.radii) / tile_size), 0, tw - 1)
        ty1 = jnp.clip(jnp.floor(
            (proj.means2d[:, 1] + proj.radii) / tile_size), 0, th - 1)
        area = ((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).astype(jnp.int32)
        return jnp.max(jnp.where(proj.valid, area, 0))

    return jnp.max(jax.vmap(pb)(viewmats, Ks))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "tile_size",
                     "max_tiles_per_gaussian", "max_per_tile"))
def bin_gaussians(means, quats, scales, opacities, sh, viewmats, Ks,
                  width: int, height: int, sh_degree: int = 1,
                  tile_size: int = 16, max_tiles_per_gaussian: int = 16,
                  max_per_tile: int = 1024) -> Bins:
    """Project + tile-bin all cameras, returning only the index structure
    (for `rasterize(..., bins=...)` reuse across training steps)."""
    tw = -(-width // tile_size)
    th = -(-height // tile_size)

    def pb(w2c, K):
        proj = project_gaussians(means, quats, scales, opacities, sh, w2c,
                                 K, sh_degree)
        return _bin_gaussians(proj, tw, th, tile_size,
                              max_tiles_per_gaussian, max_per_tile)

    (sorted_idx, ent, ent_valid, bw_idx, counts, overflow, n_clipped,
     max_count) = jax.vmap(pb)(viewmats, Ks)
    gidx = _resolve_gidx(sorted_idx, ent)
    return Bins(gidx, ent_valid, bw_idx, counts, overflow, n_clipped,
                max_count)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "sh_degree", "tile_size",
                     "max_tiles_per_gaussian", "max_per_tile", "chunk",
                     "impl"))
def rasterize(means, quats, scales, opacities, sh, viewmats, Ks,
              width: int, height: int, sh_degree: int = 1,
              tile_size: int = 16, max_tiles_per_gaussian: int = 16,
              max_per_tile: int = 1024, chunk: int = 128,
              impl: str = "auto", bins: Optional[Bins] = None):
    """Render C cameras. means (N,3), quats (N,4) wxyz, scales (N,3) linear,
    opacities (N,) linear, sh (N,K,3), viewmats=w2c (C,4,4), Ks (C,3,3).

    impl: 'auto' (the default — resolves via `_default_impl` to 'pallas'
    on TPU, the fused fwd+bwd kernels measured 1.33x faster than the XLA
    path at bench scale, and 'xla' elsewhere; the STARST3R_IMPL env var
    overrides the choice), 'pallas', 'xla' (XLA scan with hand-derived
    reverse-sweep VJP), or 'ref' (autodiff backward, parity oracle).
    Note: the Pallas compositing kernels pin their chunk length to 128
    lanes; the ``chunk`` argument only affects the xla/ref paths.

    ``bins``: optional precomputed `bin_gaussians` result — skips the two
    binning sorts (training loops rebin every `rebin_every` steps);
    projection and every gradient stay exact, only the tile assignment and
    the depth ORDER are as stale as the bins.

    Coverage caps are counted, never silent: info["n_tiles_clipped"] is the
    per-camera number of Gaussians whose tile bbox exceeded
    ``max_tiles_per_gaussian``; info["tile_overflow"] the per-camera number
    of entries dropped by ``max_per_tile``.

    Returns (rgb (C,H,W,3), alpha (C,H,W,1), info dict).
    """
    if impl == "auto":
        impl = _default_impl()
    chunk = min(chunk, max_per_tile)   # static; small auto-budget buckets
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    n = means.shape[0]

    def project_pack(w2c, K, bins_c):
        proj = project_gaussians(means, quats, scales, opacities, sh, w2c, K,
                                 sh_degree)
        if bins_c is None:
            (sorted_idx, ent, ent_valid, bw_idx, counts, overflow, n_clip,
             _) = _bin_gaussians(proj, tw, th, tile_size,
                                 max_tiles_per_gaussian, max_per_tile)
        else:
            sorted_idx = ent = None
            (gidx_b, ent_valid, bw_idx, counts, overflow, n_clip,
             _) = bins_c
        packed = jnp.concatenate(
            [proj.means2d, proj.conics, proj.colors,
             jnp.where(proj.valid, proj.opacities, 0.0)[:, None]],
            axis=1)                                        # (N, 9)
        idx = (gidx_b,) if bins_c is not None else (sorted_idx, ent)
        return (packed, idx, ent_valid, bw_idx, counts, overflow, n_clip,
                proj.means2d, proj.radii, proj.depths)

    (packed, idx, ent_valid, bw_idx, counts, overflow, n_clip, means2d,
     radii, depths) = jax.vmap(project_pack)(
        viewmats, Ks, bins if bins is not None else None)  # (C, ...)
    gidx = idx[0] if bins is not None else _resolve_gidx(*idx)

    gidx_g, ent_valid, bw_idx_g = _globalize_bins(
        gidx, ent_valid, bw_idx, n, max_per_tile)
    g_mean, g_conic, g_color, g_op = _gather_entries(
        packed.reshape(-1, packed.shape[-1]), gidx_g, ent_valid, bw_idx_g)

    if impl == "pallas":
        from .pallas_composite import TB
        if max_per_tile % 128 or (viewmats.shape[0] * tw * th) % TB:
            # kernel preconditions unmet (lane-dim slicing needs 128x
            # chunks; the grid packs TB tiles per program) — the XLA
            # analytic-VJP path is semantically identical
            impl = "xla"
    if impl == "pallas":
        from .pallas_composite import composite_tiles_pallas
        rgb, alpha = composite_tiles_pallas(
            g_mean, g_conic, g_color, g_op, counts, height, width,
            tile_size, tw, th, chunk)
    elif impl == "xla":
        rgb, alpha = _composite_tiles_xla(
            g_mean, g_conic, g_color, g_op, counts, height, width,
            tile_size, tw, th, chunk)
    else:
        rgb, alpha = jax.vmap(
            lambda gm, gc, gcl, go: _composite_tiles(
                gm, gc, gcl, go, height, width, tile_size, tw, th,
                max_per_tile, chunk))(g_mean, g_conic, g_color, g_op)

    info: Dict[str, jnp.ndarray] = {
        "means2d": means2d, "radii": radii, "depths": depths,
        "n_tiles_clipped": n_clip, "tile_overflow": overflow,
        "width": jnp.asarray(width), "height": jnp.asarray(height),
    }
    return rgb, alpha[..., None], info
