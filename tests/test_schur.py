"""Schur-complement keyframe BA (BASELINE configs 4-5): track building,
planted-pose recovery at 50 keyframes with a sliding-window pair graph, and
sharded(8-device)==single equivalence of the reduced system."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from starst3r_tpu.alignment.schur import (Tracks, build_tracks,
                                          schur_refine)


def _rotz(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]], np.float32)


def _make_seq(rng, c=50, npts=16, window=3, f=100.0):
    """c-keyframe sequence with per-camera core-grid sections (same
    construction as test_lm's synthetic_ba but windowed pairs)."""
    pps = np.full((c, 2), 64.0, np.float32)
    cam2w = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    for i in range(c):
        cam2w[i, :3, :3] = _rotz(0.02 * i)
        cam2w[i, :3, 3] = [0.1 * i, 0.02 * i, -0.03 * i]

    world = rng.uniform(-2.0, 2.0, size=(npts, 3)).astype(np.float32)
    world[:, 2] += 8.0

    s = c * npts
    core_pix = np.zeros((s, 2), np.float32)
    depths = np.ones((c, s), np.float32)
    for i in range(c):
        w2c = np.linalg.inv(cam2w[i])
        p = world @ w2c[:3, :3].T + w2c[:3, 3]
        sl = slice(i * npts, (i + 1) * npts)
        core_pix[sl] = p[:, :2] / p[:, 2:3] * f + pps[i]
        depths[i, sl] = p[:, 2]

    img1, idx1, img2, idx2 = [], [], [], []
    for i in range(c):
        for j in range(i + 1, min(c, i + window + 1)):
            for k in range(npts):
                img1.append(i)
                idx1.append(i * npts + k)
                img2.append(j)
                idx2.append(j * npts + k)
    conf = np.ones(len(img1), np.float32)
    tracks = build_tracks(np.array(img1, np.int32), np.array(idx1, np.int32),
                          np.array(img2, np.int32), np.array(idx2, np.int32),
                          conf, c, s, max_obs=8)
    return dict(cam2w=cam2w, focals=np.full((c,), f, np.float32), pps=pps,
                depths=depths, core_pix=core_pix, tracks=tracks,
                c=c, npts=npts, window=window)


@pytest.fixture
def synthetic_seq(rng):
    return _make_seq(rng)


def test_build_tracks_merges_transitively(synthetic_seq):
    d = synthetic_seq
    t = d["tracks"]
    # every world point merges into ONE logical track (50 observations),
    # split into ceil(49/7)=7 chained sub-tracks of <=8 obs each
    assert t.cam.shape == (7 * d["npts"], 8)
    # every camera appears in some sub-track (no keyframe unconstrained)
    seen = set(t.cam[t.w > 0].tolist())
    assert seen == set(range(d["c"]))
    # observations within a sub-track are distinct cameras
    for m in range(t.cam.shape[0]):
        cams = t.cam[m][t.w[m] > 0]
        assert len(set(cams.tolist())) == len(cams)


def _perturb(cam2w, rng, rot=0.02, tr=0.05):
    out = cam2w.copy()
    for i in range(1, cam2w.shape[0]):
        out[i, :3, :3] = _rotz(rng.normal() * rot) @ out[i, :3, :3]
        out[i, :3, 3] += rng.normal(size=3) * tr
    return out


def test_schur_recovers_50_keyframes(synthetic_seq, rng):
    """Config 4: 50-keyframe windowed sequence, Schur-reduced GN recovers
    the planted trajectory from a perturbed start."""
    d = synthetic_seq
    noisy = _perturb(d["cam2w"], rng)
    out, focals, costs = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], iters=15, opt_focal=False)
    assert costs[-1] < 1e-4 * costs[0], (costs[0], costs[-1])
    t_err = np.linalg.norm(out[:, :3, 3] - d["cam2w"][:, :3, 3], axis=1)
    assert t_err.max() < 2e-2, t_err.max()
    r_err = np.linalg.norm(out[:, :3, :3] - d["cam2w"][:, :3, :3],
                           axis=(1, 2))
    assert r_err.max() < 2e-2, r_err.max()


def test_schur_200_keyframes_sharded(rng):
    """BASELINE config 5: 200-keyframe windowed sequence refined with the
    track reduction SHARDED over the 8-device mesh (keyframe-block
    partitioning; VERDICT r3 #3). The scatter-free one-hot/V^T V reduction
    must both converge and recover the planted trajectory."""
    d = _make_seq(rng, c=200, npts=16, window=3)
    noisy = _perturb(d["cam2w"], rng, rot=0.01, tr=0.03)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out, _, costs = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], iters=25, opt_focal=False, mesh=mesh)
    assert costs[-1] < 1e-3 * costs[0], (costs[0], costs[-1])
    t_err = np.linalg.norm(out[:, :3, 3] - d["cam2w"][:, :3, 3], axis=1)
    assert t_err.max() < 3e-2, t_err.max()


def test_schur_sharded_matches_single(synthetic_seq, rng):
    """Config 5 pattern: track shards reduced with psum over the 8-device
    mesh must reproduce the single-device system."""
    d = synthetic_seq
    noisy = _perturb(d["cam2w"], rng)
    kw = dict(iters=3, opt_focal=False)
    out1, _, costs1 = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], **kw)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out8, _, costs8 = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], mesh=mesh, **kw)
    # costs near convergence are ~1e-5: reduction order across devices
    # shifts them at the 1e-7 level, amplified through accepted GN steps
    np.testing.assert_allclose(costs1, costs8, rtol=2e-2, atol=1e-8)
    np.testing.assert_allclose(out1, out8, atol=1e-3)
