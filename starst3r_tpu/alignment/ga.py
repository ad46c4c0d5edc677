"""Sparse global alignment: two-phase robust optimization of camera
intrinsics, poses (MST kinematic chain), per-camera scale, and core depth.

Behavioral spec (SURVEY §2a "Global-alignment optimizer" row; reference
starster/reconstruct.py:116-457):
  params        = pps + log_focals + quats + trans + log_sizes + core_depth
  reparam       : cameras centered on their median-depth focal plane
                  ("smart reparameterization", reconstruct.py:240-244);
                  global scale pinned by the min log-size (":219-221")
  chain         : cam2w composed along the MST (":232-238")
  phase 1       : loss_3d (3D-3D correspondence distance), poses only,
                  500 iters @ lr 0.07 cosine
  phase 2       : loss_2d (2D reprojection), + pp/focal (+depth if opt_depth),
                  200 iters @ lr 0.014 cosine
  fallback      : loss_dust3r (regression vs cross predictions) for pairs
                  whose matching conf <= thr, weight 0.01 (":283-323,389")
  robust loss   : annealed gamma loss (1.1 coarse / 0.4 fine)
  optimizer     : Adam betas (0.9, 0.9), quats renormalized every step
                  (":394-395"), NaN-loss freeze (":397-399")
  warm start    : prev params overwrite the first N cameras
                  (":408-415", SLAM modification)

TPU-first: every phase is ONE jitted `lax.fori_loop` — the whole 700-step
optimization runs on device without host round-trips; correspondences are
flat padded tensors (condense.py) so the losses are masked segment
reductions; the MST chain composition is a `lax.scan` over topologically
sorted edges inside the differentiable graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GAConfig
from ..utils.schedules import cosine_schedule, meta_gamma_loss
from ..utils.se3 import quat_normalize, quat_to_rotmat, se3_inverse
from .condense import CondensedData

__all__ = ("GAParams", "GAState", "init_params", "make_K_cam_depth",
           "run_global_alignment")


class GAParams(NamedTuple):
    """Optimized parameters, stacked over cameras (C = #cameras)."""

    pps: jnp.ndarray         # (C, 2) normalized principal points
    log_focals: jnp.ndarray  # (C,)
    quats: jnp.ndarray       # (C, 4) wxyz, relative rotation along the chain
    trans: jnp.ndarray       # (C, 3) relative translation along the chain
    log_sizes: jnp.ndarray   # (C,)
    core_depth: jnp.ndarray  # (C, S) median-normalized core depth


class GAState(NamedTuple):
    """Static (non-optimized) data for the GA losses."""

    imsizes: jnp.ndarray        # (C, 2) (W, H)
    base_focals: jnp.ndarray    # (C,)
    median_depths: jnp.ndarray  # (C,)
    core_pix: jnp.ndarray       # (S, 2)
    corr_img1: jnp.ndarray
    corr_idx1: jnp.ndarray
    corr_img2: jnp.ndarray
    corr_idx2: jnp.ndarray
    corr_conf: jnp.ndarray
    corr_pair: jnp.ndarray
    # anchored continuous endpoints (reference make_pts3d anchors,
    # call-site reconstruct.py:380): endpoint ray through corr_pix*, depth
    # = core_depth[corr_idx*] * corr_doff*. Defaults (grid pixel, offset 1)
    # reproduce plain core-grid correspondences exactly.
    corr_pix1: jnp.ndarray      # (M, 2)
    corr_pix2: jnp.ndarray      # (M, 2)
    corr_doff1: jnp.ndarray     # (M,)
    corr_doff2: jnp.ndarray     # (M,)
    pair_img1: jnp.ndarray
    pair_img2: jnp.ndarray
    pair_matching_ok: jnp.ndarray
    preds21_pts: jnp.ndarray
    preds21_conf: jnp.ndarray
    edge_parent: jnp.ndarray    # (C-1,) MST edges, topological order
    edge_child: jnp.ndarray     # (C-1,)
    root: jnp.ndarray           # () int32
    freeze: jnp.ndarray         # (C,) bool — per-image freeze
    min_focals: jnp.ndarray     # (C,)
    max_focals: jnp.ndarray     # (C,)
    # lora_depth (reference reconstruct.py:251-252): when not None,
    # params.core_depth holds (C, k) spectral coefficients and the dense
    # core depth is basis @ coeffs inside the loss (alignment/spectral.py)
    depth_basis: Optional[jnp.ndarray] = None   # (C, S, k) or None


def init_params(data: CondensedData) -> GAParams:
    c = data.pps.shape[0]
    return GAParams(
        pps=jnp.asarray(data.pps),
        log_focals=jnp.log(jnp.asarray(data.base_focals)),
        quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (c, 1)),
        trans=jnp.zeros((c, 3), jnp.float32),
        log_sizes=jnp.zeros((c,), jnp.float32),
        core_depth=jnp.asarray(data.core_depth),
    )


def make_state(data: CondensedData, mst: Tuple[int, Any],
               cfg: GAConfig, freeze: Optional[np.ndarray] = None,
               depth_basis: Optional[np.ndarray] = None) -> GAState:
    c = data.pps.shape[0]
    root, edges = mst
    parents = np.array([e[0] for e in edges], np.int32).reshape(-1)
    children = np.array([e[1] for e in edges], np.int32).reshape(-1)
    diags = np.linalg.norm(data.imsizes, axis=1)
    if freeze is None:
        freeze = np.zeros(c, bool)
    return GAState(
        imsizes=jnp.asarray(data.imsizes),
        base_focals=jnp.asarray(data.base_focals),
        median_depths=jnp.asarray(data.median_depths),
        core_pix=jnp.asarray(data.core_pix),
        corr_img1=jnp.asarray(data.corr_img1),
        corr_idx1=jnp.asarray(data.corr_idx1),
        corr_img2=jnp.asarray(data.corr_img2),
        corr_idx2=jnp.asarray(data.corr_idx2),
        corr_conf=jnp.asarray(data.corr_conf),
        corr_pair=jnp.asarray(data.corr_pair),
        corr_pix1=jnp.asarray(
            data.core_pix[data.corr_idx1] if data.corr_pix1 is None
            else data.corr_pix1, jnp.float32),
        corr_pix2=jnp.asarray(
            data.core_pix[data.corr_idx2] if data.corr_pix2 is None
            else data.corr_pix2, jnp.float32),
        corr_doff1=jnp.asarray(
            np.ones(len(data.corr_idx1), np.float32)
            if data.corr_doff1 is None else data.corr_doff1, jnp.float32),
        corr_doff2=jnp.asarray(
            np.ones(len(data.corr_idx2), np.float32)
            if data.corr_doff2 is None else data.corr_doff2, jnp.float32),
        pair_img1=jnp.asarray(data.pair_img1),
        pair_img2=jnp.asarray(data.pair_img2),
        pair_matching_ok=jnp.asarray(data.pair_matching_ok),
        preds21_pts=jnp.asarray(data.preds21_pts),
        preds21_conf=jnp.asarray(data.preds21_conf),
        edge_parent=jnp.asarray(parents),
        edge_child=jnp.asarray(children),
        root=jnp.asarray(root, jnp.int32),
        freeze=jnp.asarray(freeze),
        min_focals=jnp.asarray(cfg.min_focal_factor * diags, jnp.float32),
        max_focals=jnp.asarray(cfg.max_focal_factor * diags, jnp.float32),
        depth_basis=(None if depth_basis is None
                     else jnp.asarray(depth_basis)),
    )


def make_K_cam_depth(params: GAParams, state: GAState,
                     depth_mode: str = "add",
                     shared_intrinsics: bool = False,
                     exp_depth: bool = False):
    """The reparameterization core (reference reconstruct.py:209-261).

    ``shared_intrinsics`` (reference reconstruct.py:67, sparse_ga's
    shared_intrinsics=True): a single focal + principal point is shared by
    all cameras. Implemented by tying the per-camera leaves through their
    mean — every leaf receives an identical gradient, so under Adam the
    shared value evolves exactly like one parameter while the pytree shape
    stays static.

    Returns (K (C,3,3), w2c, cam2w (C,4,4), depth (C,S) core-grid metric
    depth). Fully differentiable; runs inside the loss jit.
    """
    c = params.pps.shape[0]
    if shared_intrinsics:
        log_f = jnp.broadcast_to(jnp.mean(params.log_focals),
                                 params.log_focals.shape)
        pps = jnp.broadcast_to(jnp.mean(params.pps, axis=0, keepdims=True),
                               params.pps.shape)
    else:
        log_f = params.log_focals
        pps = params.pps
    focals = jnp.clip(jnp.exp(log_f),
                      state.min_focals, state.max_focals)  # (C,)
    pp_pix = pps * state.imsizes                            # (C, 2)
    K = jnp.zeros((c, 3, 3), jnp.float32)
    K = K.at[:, 0, 0].set(focals)
    K = K.at[:, 1, 1].set(focals)
    K = K.at[:, 0:2, 2].set(pp_pix)
    K = K.at[:, 2, 2].set(1.0)

    # security: optimization always tries to crush the scale down
    # (reference reconstruct.py:219-221)
    sizes = jnp.exp(params.log_sizes)
    global_scaling = 1.0 / jnp.min(sizes)

    # distance of each camera to its focal plane (reconstruct.py:224-226)
    z_cameras = sizes * state.median_depths * focals / state.base_focals

    # relative poses -> kinematic chain along the MST
    R = quat_to_rotmat(quat_normalize(params.quats))        # (C, 3, 3)
    rel = jnp.zeros((c, 4, 4), jnp.float32)
    rel = rel.at[:, :3, :3].set(R)
    rel = rel.at[:, :3, 3].set(params.trans)
    rel = rel.at[:, 3, 3].set(1.0)

    cam2w0 = jnp.zeros((c, 4, 4), jnp.float32)
    cam2w0 = cam2w0.at[state.root].set(rel[state.root])

    def chain_step(acc, edge):
        p_idx, c_idx = edge
        acc = acc.at[c_idx].set(acc[p_idx] @ rel[c_idx])
        return acc, None

    if state.edge_parent.shape[0] > 0:
        cam2w_chain, _ = jax.lax.scan(
            chain_step, cam2w0, (state.edge_parent, state.edge_child))
    else:
        cam2w_chain = cam2w0

    # smart reparameterization: center each camera on its median-depth focal
    # plane (reconstruct.py:240-244)
    ones = jnp.ones((c, 1), jnp.float32)
    trans_offset = z_cameras[:, None] * jnp.concatenate(
        [state.imsizes / focals[:, None] * (0.5 - pps), ones], axis=-1)
    new_trans = global_scaling * (
        cam2w_chain[:, :3, 3]
        - jnp.einsum("cij,cj->ci", cam2w_chain[:, :3, :3], trans_offset))
    cam2w = cam2w_chain.at[:, :3, 3].set(new_trans)

    # core-grid metric depth (depth_mode='add', reconstruct.py:247-259)
    core = params.core_depth                                # (C, S) or (C, k)
    if exp_depth:
        # exp_depth (reference reconstruct.py:249-250, init :274-275):
        # core depth is parameterized in log space — exp BEFORE the lora
        # expansion, mirroring the reference's runtime order
        core = jnp.exp(core)
    if state.depth_basis is not None:
        # lora_depth expansion (reconstruct.py:251-252): dense core depth
        # from spectral coefficients — one batched MXU matmul. Full fp32:
        # a signed k~96-term reduction feeding the loss AND the returned
        # depth loses ~3 digits at default (bf16) matmul precision.
        core = jnp.einsum("csk,ck->cs", state.depth_basis, core,
                          precision=jax.lax.Precision.HIGHEST)
    if depth_mode == "add":
        depth = z_cameras[:, None] + (core - 1.0) * (
            state.median_depths * sizes)[:, None]
    elif depth_mode == "mul":
        depth = z_cameras[:, None] * core
    else:
        raise ValueError(depth_mode)
    depth = global_scaling * depth

    return K, se3_inverse(cam2w), cam2w, depth


def _core_pts3d(K, cam2w, depth, state: GAState):
    """Unproject core-grid depth to world points: (C, S, 3)."""
    pix = state.core_pix[None]                    # (1, S, 2)
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    x = (pix[..., 0] - cx) / fx * depth
    y = (pix[..., 1] - cy) / fy * depth
    cam_pts = jnp.stack([x, y, depth], axis=-1)   # (C, S, 3)
    R = cam2w[:, :3, :3]
    t = cam2w[:, :3, 3]
    return jnp.einsum("cij,csj->csi", R, cam_pts) + t[:, None, :]


@jax.custom_vjp
def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` whose BACKWARD is a one-hot matmul, not a scatter.

    The autodiff VJP of a gather is scatter-add; XLA lowers TPU scatters
    with duplicate indices to a SERIAL per-row loop — the GA step graph
    carried 74 of them and spent ~280 ms/step in thousands of sequential
    dynamic-slice ops (profiled tools/probe_ga_profile.py). The one-hot
    contraction (M, R) @ (M, D) -> (R, D) runs on the MXU in microseconds
    at GA scale (R <= a few thousand rows, M ~ 1e4 correspondences).

    table (R, D); idx (M,) int32. Returns (M, D).
    """
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _factored_onehot_colsum(idx: jnp.ndarray, ct: jnp.ndarray,
                            nrows: int) -> jnp.ndarray:
    """Σ_m [idx_m == r] * ct_m for D=1 cotangents via a TWO-LEVEL one-hot:
    idx = hi*B + lo with B ≈ √R, so the contraction is one (H, M) @ (M, B)
    matmul with peak memory M*(B + R/B) ≈ 2M√R instead of the dense (M, R)
    one-hot — at the 512px GA operating point (S=4096, ~10 cams, M ≈ 8e4
    anchored endpoints: R = C*S ≈ 4e4) the dense form is ~13 GB and OOMs a
    16 GB chip, the factored form ~130 MB (ADVICE r4 medium)."""
    m = idx.shape[0]
    b = 1 << max((max(nrows - 1, 1).bit_length() + 1) // 2, 1)  # ≈ √R, pow2
    hblocks = -(-nrows // b)
    hi = (idx // b)[:, None]
    lo = (idx % b)[:, None]
    oh_hi = (hi == jnp.arange(hblocks, dtype=idx.dtype)[None, :]
             ).astype(ct.dtype)                            # (M, H)
    oh_lo = (lo == jnp.arange(b, dtype=idx.dtype)[None, :]
             ).astype(ct.dtype)                            # (M, B)
    hl = jnp.einsum("mh,ml->hl", oh_hi, oh_lo * ct,
                    precision=jax.lax.Precision.HIGHEST)   # (H, B)
    return hl.reshape(hblocks * b, 1)[:nrows]


def _gather_rows_bwd(res, ct):
    idx, nrows = res
    if jax.default_backend() != "tpu":
        # CPU/GPU scatters are fast and the one-hot matmul is not: use
        # the plain scatter-add there (traced per backend at jit time)
        d = jnp.zeros((nrows,) + ct.shape[1:], ct.dtype).at[idx].add(ct)
        return d, None
    if ct.shape[1] == 1 and idx.shape[0] * nrows > (1 << 26):
        # the big-R case is the per-correspondence depth gather (R = C*S,
        # D = 1); every other gather here has R = #cameras
        return _factored_onehot_colsum(idx, ct, nrows), None
    oh = (idx[:, None] == jnp.arange(nrows, dtype=idx.dtype)[None, :]
          ).astype(ct.dtype)                               # (M, R)
    d = jnp.einsum("mr,md->rd", oh, ct,
                   precision=jax.lax.Precision.HIGHEST)
    return d, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _endpoint_pts(K, cam2w, depth, state: GAState, img, idx, pix, doff):
    """World position of anchored correspondence endpoints (M, 3).

    Endpoint ray passes through the continuous pixel ``pix``; its depth is
    the optimized core depth at the anchor cell ``idx`` times the fixed
    offset ``doff`` — the reference's make_pts3d anchor densification
    (call-site reconstruct.py:380). With pix = core_pix[idx] and doff = 1
    this reduces exactly to gathering the core-grid 3D points.
    """
    c, s = depth.shape
    z = _gather_rows(depth.reshape(c * s, 1),
                     img * s + idx)[:, 0] * doff   # (M,)
    Km = _gather_rows(K.reshape(c, 9), img)        # (M, 9)
    fx, fy = Km[:, 0], Km[:, 4]
    cx, cy = Km[:, 2], Km[:, 5]
    x = (pix[:, 0] - cx) / fx * z
    y = (pix[:, 1] - cy) / fy * z
    cam_pts = jnp.stack([x, y, z], axis=-1)        # (M, 3)
    Tm = _gather_rows(cam2w.reshape(c, 16), img).reshape(-1, 4, 4)
    R = Tm[:, :3, :3]                              # (M, 3, 3)
    t = Tm[:, :3, 3]
    return jnp.einsum("mij,mj->mi", R, cam_pts) + t


def _loss_3d(K, cam2w, depth, state: GAState, gamma: float, alpha):
    """3D-3D correspondence loss over matching-ok, non-frozen pairs
    (reference reconstruct.py:325-353)."""
    ok = state.pair_matching_ok[state.corr_pair]
    both_frozen = (state.freeze[state.corr_img1]
                   & state.freeze[state.corr_img2])
    wgt = state.corr_conf * ok * (~both_frozen)
    p1 = _endpoint_pts(K, cam2w, depth, state, state.corr_img1,
                       state.corr_idx1, state.corr_pix1, state.corr_doff1)
    p2 = _endpoint_pts(K, cam2w, depth, state, state.corr_img2,
                       state.corr_idx2, state.corr_pix2, state.corr_doff2)
    dist = jnp.linalg.norm(p1 - p2 + 1e-12, axis=-1)
    loss = jnp.sum(wgt * meta_gamma_loss(dist, gamma, alpha))
    return loss / jnp.maximum(jnp.sum(wgt), 1e-8)


def _loss_2d(K, cam2w, depth, w2c, state: GAState, gamma: float, alpha):
    """2D reprojection loss (reference reconstruct.py:355-369): project the
    matched point of image2 into image1, compare with the match's pixel."""
    ok = state.pair_matching_ok[state.corr_pair]
    img1_frozen = state.freeze[state.corr_img1]
    wgt = state.corr_conf * ok * (~img1_frozen)
    proj = K @ w2c[:, :3]                          # (C, 3, 4)
    p2 = _endpoint_pts(K, cam2w, depth, state, state.corr_img2,
                       state.corr_idx2, state.corr_pix2, state.corr_doff2)
    pm = _gather_rows(proj.reshape(-1, 12),
                      state.corr_img1).reshape(-1, 3, 4)   # (M, 3, 4)
    homo = jnp.einsum("mij,mj->mi", pm[:, :, :3], p2) + pm[:, :, 3]
    z = homo[:, 2:3]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = homo[:, :2] / z
    pix1 = state.corr_pix1                         # (M, 2)
    dist = jnp.linalg.norm(uv - pix1 + 1e-12, axis=-1)
    loss = jnp.sum(wgt * meta_gamma_loss(dist, gamma, alpha))
    return loss / jnp.maximum(jnp.sum(wgt), 1e-8)


def _loss_dust3r(pts3d, cam2w, state: GAState, gamma: float):
    """Regression fallback for low-matching pairs
    (reference reconstruct.py:283-323): compare image1's core points with the
    cross prediction (image1 in image2's frame) brought to world."""
    bad = ~state.pair_matching_ok                   # (P,)
    both_frozen = (state.freeze[state.pair_img1]
                   & state.freeze[state.pair_img2])
    pair_w = bad & (~both_frozen)                   # (P,)
    Tp = _gather_rows(cam2w.reshape(-1, 16),
                      state.pair_img2).reshape(-1, 4, 4)
    R = Tp[:, :3, :3]                               # (P, 3, 3)
    t = Tp[:, :3, 3]                                # (P, 3)
    tgt = jnp.einsum("pij,psj->psi", R, state.preds21_pts) + t[:, None, :]
    c, s = pts3d.shape[0], pts3d.shape[1]
    ours = _gather_rows(pts3d.reshape(c, s * 3),
                        state.pair_img1).reshape(-1, s, 3)  # (P, S, 3)
    dist = jnp.linalg.norm(ours - tgt + 1e-12, axis=-1)   # (P, S)
    wgt = state.preds21_conf * pair_w[:, None]
    loss = jnp.sum(wgt * meta_gamma_loss(dist, gamma, 0.0))
    cf = jnp.sum(wgt)
    return jnp.where(cf > 0, loss / jnp.maximum(cf, 1e-8), 0.0)


def _trainable_mask(params: GAParams, state: GAState, phase: int,
                    cfg: GAConfig) -> GAParams:
    """Per-leaf 0/1 masks replicating the reference's requires_grad pattern
    (reconstruct.py:417-437)."""
    c = params.pps.shape[0]
    free = (~state.freeze).astype(jnp.float32)      # (C,)
    zeros = jnp.zeros((c,), jnp.float32)
    if phase == 1:
        return GAParams(
            pps=jnp.zeros_like(params.pps),
            log_focals=zeros,
            quats=free[:, None] * jnp.ones_like(params.quats),
            trans=free[:, None] * jnp.ones_like(params.trans),
            log_sizes=free,
            core_depth=jnp.zeros_like(params.core_depth),
        )
    return GAParams(
        pps=(free * float(cfg.opt_pp))[:, None] * jnp.ones_like(params.pps),
        log_focals=free,
        quats=free[:, None] * jnp.ones_like(params.quats),
        trans=free[:, None] * jnp.ones_like(params.trans),
        log_sizes=free,
        core_depth=(free * float(cfg.opt_depth))[:, None]
        * jnp.ones_like(params.core_depth),
    )


def _phase_opt(cfg: GAConfig, niter: int, lr_base: float, lr_end: float):
    def lr_at(step):
        alpha = step.astype(jnp.float32) / max(niter, 1)
        return cosine_schedule(alpha, lr_base, lr_end)

    return optax.chain(
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2),
        optax.scale_by_schedule(lambda s: -lr_at(s)),
    )


def _optimize_chunk(*args, **kw):
    # FULL f32 matmul precision for the whole alignment graph: at the
    # MXU's default bf16 input rounding the pose-chain composition and
    # endpoint transforms carry ~0.4% relative error, which FLOORS the
    # GA's convergence on TPU ~10x above its CPU accuracy (snap-free ATE
    # 1.6-1.9% on TPU vs 0.14% on CPU before this; the matmuls here are
    # 4x4 / M-row einsums — precision costs nothing at this size).
    with jax.default_matmul_precision("highest"):
        return _optimize_chunk_jit(*args, **kw)


@functools.partial(jax.jit, static_argnames=("niter", "nsteps", "lr_base",
                                             "lr_end", "gamma", "phase",
                                             "cfg"))
def _optimize_chunk_jit(params: GAParams, opt_state, stopped, prev_loss,
                        state: GAState, start, niter: int, nsteps: int,
                    lr_base: float, lr_end: float, gamma: float, phase: int,
                    cfg: GAConfig):
    """``nsteps`` optimization steps starting at absolute step ``start``
    of an ``niter``-step phase (lax.fori_loop on device).

    Phases are CHUNKED into short kernels by `_optimize_phase`: the axon
    TPU tunnel kills device kernels that run longer than a few seconds, and
    a 500-iteration fori_loop at real scene sizes exceeds that; chunking
    also gives the host a progress/interrupt point. The Adam state,
    absolute-step LR/annealing schedules, and the NaN-freeze flag all
    thread through unchanged, so chunked == unchunked bit-for-bit."""

    mask = _trainable_mask(params, state, phase, cfg)
    opt = _phase_opt(cfg, niter, lr_base, lr_end)

    def loss_fn(p, step):
        K, w2c, cam2w, depth = make_K_cam_depth(p, state, cfg.depth_mode,
                                                cfg.shared_intrinsics,
                                                cfg.exp_depth)
        alpha = 1.0 - step.astype(jnp.float32) / max(niter, 1)
        if phase == 1:
            main = _loss_3d(K, cam2w, depth, state, gamma, alpha)
        else:
            main = _loss_2d(K, cam2w, depth, w2c, state, gamma, alpha)
        pts3d = _core_pts3d(K, cam2w, depth, state)
        reg = _loss_dust3r(pts3d, cam2w, state, cfg.gamma_d)
        return main + cfg.loss_dust3r_w * reg

    def body(step, carry):
        p, opt_state, last_loss, stopped = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, step)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        updates, opt_state2 = opt.update(grads, opt_state, p)
        p2 = optax.apply_updates(p, updates)
        # quats renorm each step (reference reconstruct.py:394-395)
        p2 = p2._replace(quats=quat_normalize(p2.quats))
        # NaN guard (reference reconstruct.py:397-399): freeze on NaN
        bad = ~jnp.isfinite(loss)
        stop_now = stopped | bad
        keep = lambda old, new: jax.tree_util.tree_map(
            lambda a, b: jnp.where(stop_now, a, b), old, new)
        return (keep(p, p2), keep(opt_state, opt_state2),
                jnp.where(stop_now, last_loss, loss), stop_now)

    init = (params, opt_state, prev_loss, stopped)
    params, opt_state, final_loss, stopped = jax.lax.fori_loop(
        start, start + nsteps, body, init)
    return params, opt_state, final_loss, stopped


def _optimize_phase(params: GAParams, state: GAState, niter: int,
                    lr_base: float, lr_end: float, gamma: float, phase: int,
                    cfg: GAConfig):
    """One optimization phase, chunked into short device kernels (see
    `_optimize_chunk`). Returns (params, final_loss)."""
    opt_state = _phase_opt(cfg, niter, lr_base, lr_end).init(params)
    stopped = jnp.asarray(False)
    loss = jnp.asarray(jnp.inf, jnp.float32)
    ch = max(int(cfg.jit_chunk), 1)
    done = 0
    while done < niter:
        n = min(ch, niter - done)
        params, opt_state, loss, stopped = _optimize_chunk(
            params, opt_state, stopped, loss, state,
            jnp.asarray(done, jnp.int32), niter, n, lr_base, lr_end,
            gamma, phase, cfg)
        # host sync: keeps every dispatched kernel short (axon watchdog)
        jax.block_until_ready(loss)
        done += n
    return params, loss


class GAResult(NamedTuple):
    K: jnp.ndarray          # (C, 3, 3)
    w2c: jnp.ndarray        # (C, 4, 4)
    cam2w: jnp.ndarray      # (C, 4, 4)
    depth: jnp.ndarray      # (C, S) core metric depth
    pts3d: jnp.ndarray      # (C, S, 3) core world points
    loss_coarse: float
    loss_fine: float


def run_global_alignment(
    data: CondensedData,
    mst: Tuple[int, Any],
    cfg: GAConfig,
    prev_params: Optional[GAParams] = None,
    freeze: Optional[np.ndarray] = None,
    depth_basis: Optional[np.ndarray] = None,
    depth_coeffs: Optional[np.ndarray] = None,
) -> Tuple[GAResult, GAParams]:
    """Full two-phase GA with optional SLAM warm start.

    ``prev_params`` (from a previous call, possibly with fewer cameras)
    overwrites the first N cameras' parameters — the reference's incremental
    mechanism (reconstruct.py:408-415).

    ``depth_basis``/``depth_coeffs`` ((C,S,k), (C,k)) from
    `spectral.spectral_projection_of_depthmaps` switch on the lora_depth
    re-parameterization (reference reconstruct.py:251-252, 270-273).
    """
    state = make_state(data, mst, cfg, freeze, depth_basis=depth_basis)
    params = init_params(data)
    if depth_basis is not None:
        if depth_coeffs is None:
            raise ValueError("depth_basis requires depth_coeffs")
        params = params._replace(core_depth=jnp.asarray(depth_coeffs))
    if cfg.exp_depth:
        # log-space depth parameterization at init (reference
        # reconstruct.py:274-275: clip(1e-4).log() — applied AFTER the
        # lora substitution, i.e. to whatever core_depth now holds)
        params = params._replace(core_depth=jnp.log(
            jnp.clip(params.core_depth, 1e-4, None)))

    if prev_params is not None:
        from ..utils.checkpoint import tree_prefix_overwrite
        # warm-starting across depth parameterizations is unsound: dense
        # (C, S) core depth and (C, k) lora coefficients must not be mixed
        # (the common-slice merge would silently combine them), and lora
        # coefficients are only valid against the basis they were fit to
        prev_cd = jnp.asarray(prev_params.core_depth)
        new_cd = jnp.asarray(params.core_depth)
        if prev_cd.shape[1:] != new_cd.shape[1:]:
            raise ValueError(
                "prev_params.core_depth trailing shape "
                f"{prev_cd.shape[1:]} != current {new_cd.shape[1:]}: the "
                "previous run used a different depth parameterization "
                "(lora_depth / lora_k changed between add_images calls). "
                "Re-run without warm start or keep the GA depth config "
                "fixed across calls.")
        params = GAParams(*tree_prefix_overwrite(tuple(params),
                                                 tuple(prev_params)))

    loss1 = jnp.nan
    if cfg.niter1:
        params, loss1 = _optimize_phase(
            params, state, cfg.niter1, cfg.lr1, cfg.lr_end, cfg.gamma1, 1, cfg)
    loss2 = jnp.nan
    if cfg.niter2:
        params, loss2 = _optimize_phase(
            params, state, cfg.niter2, cfg.lr2, cfg.lr_end, cfg.gamma2, 2, cfg)

    K, w2c, cam2w, depth = make_K_cam_depth(params, state, cfg.depth_mode,
                                            cfg.shared_intrinsics,
                                            cfg.exp_depth)
    pts3d = _core_pts3d(K, cam2w, depth, state)
    result = GAResult(K=K, w2c=w2c, cam2w=cam2w, depth=depth, pts3d=pts3d,
                      loss_coarse=float(loss1), loss_fine=float(loss2))
    return result, params
