"""Canonical aggregation (reference reconstruct.py:101-102, mode='avg-angle')
and the condense-stage correspondence cap."""

import numpy as np
import pytest

from starst3r_tpu.alignment.canonical import (_avg_angle_depth,
                                              build_canonical_views)
from starst3r_tpu.models.mast3r import PairPrediction

H = W = 32
SUB = 8


def _pred(idx1, idx2, pts1, conf1):
    z = np.zeros((H, W, 3), np.float32)
    o = np.ones((H, W), np.float32)
    return PairPrediction(idx1=idx1, idx2=idx2,
                          pts1=pts1.astype(np.float32),
                          conf1=conf1.astype(np.float32),
                          pts2=z, conf2=o,
                          desc1=np.zeros((H, W, 4), np.float32),
                          desc2=np.zeros((H, W, 4), np.float32),
                          desc_conf1=o, desc_conf2=o)


def _plane_pts(slope=0.0, scale=1.0):
    """Pointmap of a fronto-parallel-ish plane z = scale*(3 + slope*x/W)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    z = scale * (3.0 + slope * xs / W)
    f = 40.0
    x3 = (xs - W / 2) / f * z
    y3 = (ys - H / 2) / f * z
    return np.stack([x3, y3, z], -1)


def test_avg_angle_single_prediction_is_exact():
    """With one prediction, the angle decomposition must reconstruct the
    prediction's own depth exactly (arctan then tan round-trips)."""
    pts = _plane_pts(slope=0.8)
    conf = 1.0 + np.exp(np.random.default_rng(0).normal(size=(H, W)))
    canon2 = np.asarray(_avg_angle_depth(pts[None], conf[None], SUB))
    np.testing.assert_allclose(canon2, pts[..., 2], rtol=1e-5)


def test_avg_angle_is_scale_consistent():
    """Two predictions of the SAME surface at different global scales vote
    identically on the angles; the result is the mid-scale surface — not a
    conf-weighted depth average biased by whichever prediction happens to
    be more confident."""
    pts_a = _plane_pts(slope=0.8, scale=1.0)
    pts_b = _plane_pts(slope=0.8, scale=2.0)
    # wildly different confidences must not skew the angle vote
    conf_a = np.full((H, W), 1.001, np.float32)
    conf_b = np.full((H, W), 9.0, np.float32)
    canon2 = np.asarray(_avg_angle_depth(
        np.stack([pts_a, pts_b]), np.stack([conf_a, conf_b]), SUB))
    mid = _plane_pts(slope=0.8, scale=1.5)[..., 2]
    np.testing.assert_allclose(canon2, mid, rtol=2e-2)


def test_build_canonical_views_modes():
    pts = _plane_pts(slope=0.5)
    conf = np.full((H, W), 3.0, np.float32)
    preds = [_pred(0, 1, pts, conf)]
    views_a, _ = build_canonical_views(2, preds + [_pred(1, 0, pts, conf)],
                                       subsample=SUB, mode="avg-angle")
    views_c, _ = build_canonical_views(2, preds + [_pred(1, 0, pts, conf)],
                                       subsample=SUB, mode="conf")
    # single prediction per image: both modes must agree with the input
    for vs in (views_a, views_c):
        np.testing.assert_allclose(vs[0].depth, pts[..., 2], rtol=1e-4)
        np.testing.assert_allclose(vs[0].pts3d, pts, atol=1e-4)


def test_condense_max_corres_cap_keeps_top_conf():
    from starst3r_tpu.alignment.condense import condense
    from starst3r_tpu.ops.matching import PairMatches, subsample_grid_indices

    import jax.numpy as jnp

    grid, hs, ws = subsample_grid_indices(H, W, SUB)
    s = int(np.asarray(grid).shape[0])
    pts = _plane_pts()
    conf = np.full((H, W), 3.0, np.float32)
    views, preds21 = build_canonical_views(
        2, [_pred(0, 1, pts, conf), _pred(1, 0, pts, conf)], subsample=SUB)
    mconf = np.arange(s, dtype=np.float32) + 1.0   # distinct, increasing
    m = PairMatches(idx1=jnp.arange(s, dtype=jnp.int32),
                    idx2=jnp.arange(s, dtype=jnp.int32),
                    conf=jnp.asarray(mconf),
                    mask=jnp.ones(s, bool),
                    sim=jnp.ones(s, jnp.float32))
    cap = s // 2
    data = condense(views, {(0, 1): m}, preds21, (H, W), SUB,
                    matching_conf_thr=0.0, max_corres_per_pair=cap)
    assert data.corr_conf.shape[0] == cap
    # the kept slots are exactly the top-conf half
    np.testing.assert_array_equal(np.sort(data.corr_conf),
                                  np.sort(mconf)[-cap:])
    full = condense(views, {(0, 1): m}, preds21, (H, W), SUB,
                    matching_conf_thr=0.0)
    assert full.corr_conf.shape[0] == s
