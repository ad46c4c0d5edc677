"""Ground-truth correctness of the Adam global alignment (VERDICT r1 #2).

Builds a synthetic multi-view scene with PLANTED camera poses and
geometrically consistent correspondences (all core points lie exactly on a
known world sphere — curved, so no planar SfM degeneracy), then requires
`run_global_alignment` to recover the trajectory after gauge (Umeyama)
alignment. The construction's only noise is core-grid snapping (~1px), so
the assertions are calibrated against the loss value AT the planted
configuration: a subtly wrong GA — sign error in a loss, chain composed
backwards, bad reparameterization — cannot reach that noise floor and
shifts the trajectory far beyond the ATE bound (identity-init ATE is ~70%
of trajectory scale; the bound is 12%).

The reference's de-facto spec is that this pipeline recovers real geometry
(reference: main.py:46-88); SURVEY §7.6 prescribes exactly this synthetic
planted-pose test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from starst3r_tpu.alignment import ga as ga_mod
from starst3r_tpu.alignment.condense import CondensedData
from starst3r_tpu.alignment.ga import run_global_alignment
from starst3r_tpu.config import GAConfig
from starst3r_tpu.ops.matching import subsample_grid_indices
from starst3r_tpu.utils.eval import ate_rmse, rpe_rotation_deg

H = W = 128
F_GT = 180.0
SUB = 4
SPH_C = np.array([0.0, 0.0, 4.0])
SPH_R = 2.0
N_CAMS = 4


def _look_at_poses(n):
    """Cameras on an arc with real baseline, all facing the sphere (+z)."""
    c2w = []
    for k in range(n):
        ang = (k - (n - 1) / 2) * 0.25
        off = np.array([1.2 * np.sin(ang), 0.25 * k, 0.5 * (1 - np.cos(ang))])
        ry = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                       [-np.sin(ang), 0, np.cos(ang)]])
        m = np.eye(4)
        m[:3, :3] = ry
        m[:3, 3] = off
        c2w.append(m)
    return np.stack(c2w)


def _ray_sphere_depth(c2w, K, pix):
    """Depth along camera z of the first ray-sphere intersection."""
    d_cam = np.stack([(pix[:, 0] - K[0, 2]) / K[0, 0],
                      (pix[:, 1] - K[1, 2]) / K[1, 1],
                      np.ones(len(pix))], -1)
    d_w = d_cam @ c2w[:3, :3].T
    o = c2w[:3, 3]
    oc = o - SPH_C
    b = (d_w * oc).sum(-1)
    cterm = (oc * oc).sum() - SPH_R ** 2
    a = (d_w * d_w).sum(-1)
    disc = np.maximum(b * b - a * cterm, 1e-9)
    return (-b - np.sqrt(disc)) / a


def _project(c2w, K, X):
    R = c2w[:3, :3].T
    t = -R @ c2w[:3, 3]
    cam = X @ R.T + t
    z = cam[:, 2]
    u = K[0, 0] * cam[:, 0] / z + K[0, 2]
    v = K[1, 1] * cam[:, 1] / z + K[1, 2]
    return np.stack([u, v], -1), z


def _build_synthetic(focal_error: float = 0.0):
    gt = _look_at_poses(N_CAMS)
    K = np.array([[F_GT, 0, W / 2], [0, F_GT, H / 2], [0, 0, 1]])
    grid, hs, ws = subsample_grid_indices(H, W, SUB)
    grid = np.asarray(grid)
    s = grid.shape[0]
    core_pix = np.stack([grid % W, grid // W], -1).astype(np.float64)
    depths = np.stack([_ray_sphere_depth(gt[i], K, core_pix)
                       for i in range(N_CAMS)])
    pts = []
    for i in range(N_CAMS):
        dc = np.stack([(core_pix[:, 0] - K[0, 2]) / K[0, 0] * depths[i],
                       (core_pix[:, 1] - K[1, 2]) / K[1, 1] * depths[i],
                       depths[i]], -1)
        pts.append(dc @ gt[i][:3, :3].T + gt[i][:3, 3])
    pts = np.stack(pts)

    pairs = [(i, j) for i in range(N_CAMS) for j in range(N_CAMS) if i != j]
    p = len(pairs)
    ci1 = np.zeros((p, s), np.int32)
    cx1 = np.zeros((p, s), np.int32)
    ci2 = np.zeros((p, s), np.int32)
    cx2 = np.zeros((p, s), np.int32)
    cc = np.zeros((p, s), np.float32)
    cp = np.zeros((p, s), np.int32)
    for k, (i, j) in enumerate(pairs):
        uv, z = _project(gt[j], K, pts[i])
        gx = np.clip(np.round((uv[:, 0] - SUB // 2) / SUB), 0, ws - 1)
        gy = np.clip(np.round((uv[:, 1] - SUB // 2) / SUB), 0, hs - 1)
        idx2 = (gy * ws + gx).astype(np.int32)
        inside = ((uv[:, 0] > 1) & (uv[:, 0] < W - 2) & (uv[:, 1] > 1)
                  & (uv[:, 1] < H - 2) & (z > 0.1))
        ci1[k] = i
        cx1[k] = np.arange(s)
        ci2[k] = j
        cx2[k] = idx2
        cc[k] = inside.astype(np.float32)
        cp[k] = k

    med = np.median(depths, axis=1)
    data = CondensedData(
        imsizes=np.tile(np.array([[W, H]], np.float32), (N_CAMS, 1)),
        pps=np.tile(np.array([[0.5, 0.5]], np.float32), (N_CAMS, 1)),
        base_focals=np.full(N_CAMS, F_GT * (1 + focal_error), np.float32),
        core_depth=(depths / med[:, None]).astype(np.float32),
        median_depths=med.astype(np.float32),
        core_pix=core_pix.astype(np.float32),
        corr_img1=ci1.reshape(-1), corr_idx1=cx1.reshape(-1),
        corr_img2=ci2.reshape(-1), corr_idx2=cx2.reshape(-1),
        corr_conf=cc.reshape(-1), corr_pair=cp.reshape(-1),
        pair_img1=np.array([a for a, _ in pairs], np.int32),
        pair_img2=np.array([b for _, b in pairs], np.int32),
        pair_matching_ok=np.ones(p, bool),
        preds21_pts=np.zeros((p, s, 3), np.float32),
        preds21_conf=np.zeros((p, s), np.float32),
    )
    mst = (0, [(i, i + 1) for i in range(N_CAMS - 1)])
    return data, mst, gt


def _loss3d_at_gt(data, mst, gt):
    """The 3D loss at the PLANTED configuration — the noise floor."""
    state = ga_mod.make_state(data, mst, GAConfig())
    K = np.array([[F_GT, 0, W / 2], [0, F_GT, H / 2], [0, 0, 1]])
    kj = jnp.asarray(np.tile(K[None], (N_CAMS, 1, 1)), jnp.float32)
    med = np.asarray(data.median_depths)
    depth = jnp.asarray(np.asarray(data.core_depth) * med[:, None])
    pts3d = ga_mod._core_pts3d(kj, jnp.asarray(gt, jnp.float32), depth, state)
    return float(ga_mod._loss_3d(pts3d, state, 1.1, 0.0))


def _traj_scale(gt):
    return np.linalg.norm(gt[:, :3, 3] - gt[:, :3, 3].mean(0), axis=1).max()


def test_ga_recovers_planted_poses():
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst,
                                     GAConfig(niter1=300, niter2=120))
    pred = np.asarray(result.cam2w)
    assert np.all(np.isfinite(pred))
    ate = ate_rmse(pred, gt)
    assert ate < 0.12 * _traj_scale(gt), ate
    assert rpe_rotation_deg(pred, gt) < 8.0
    # the optimizer must reach the construction's noise floor: a sign error
    # or reversed chain plateaus at >> 1.5x the planted-config loss
    floor = _loss3d_at_gt(data, mst, gt)
    assert result.loss_coarse < 1.5 * floor, (result.loss_coarse, floor)


def test_ga_canary_identity_init_fails_bound():
    """The tolerance actually separates solved from unsolved: the initial
    (identity-chain) poses must NOT pass the ATE bound."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst, GAConfig(niter1=0, niter2=0))
    pred = np.asarray(result.cam2w)
    assert ate_rmse(pred, gt) > 0.12 * _traj_scale(gt)


def test_ga_shared_intrinsics():
    """shared_intrinsics=True (reference reconstruct.py:67) must produce ONE
    K for all cameras and still recover the planted trajectory (the
    synthetic scene genuinely shares its intrinsics)."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(
        data, mst, GAConfig(niter1=300, niter2=120, shared_intrinsics=True))
    K = np.asarray(result.K)
    np.testing.assert_allclose(K, np.broadcast_to(K[:1], K.shape), atol=1e-4)
    pred = np.asarray(result.cam2w)
    assert ate_rmse(pred, gt) < 0.12 * _traj_scale(gt)


def test_ga_focal_stays_stable():
    """Phase 2 optimizes log-focals. Focal is only weakly observable in this
    parameterization (the reparameterized depth scales with focal — same as
    the reference, reconstruct.py:224-226), so full recovery from a wrong
    prior is not expected; what MUST hold is that correct base focals stay
    near truth while poses converge (the ~1px snap noise drifts them by up
    to ~15% — focal/depth trade off near-freely here) — a sign error in the
    focal path runs them to the clamp bounds (0.25x image diagonal = 45px,
    10x = 1810px), far outside the 25% band asserted."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst,
                                     GAConfig(niter1=300, niter2=200))
    rec_f = np.asarray(result.K)[:, 0, 0]
    rel = np.abs(rec_f - F_GT) / F_GT
    assert rel.max() < 0.25, rec_f
