"""LM bundle-adjustment tests: pose recovery on a synthetic scene and
sharded-reduction equivalence (SURVEY §7.6 "GA must recover planted poses";
§2c BA row for the psum-reduced normal equations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from starst3r_tpu.alignment.lm import chain_to_absolute, lm_refine
from starst3r_tpu.utils.se3 import quat_to_rotmat


def _rotz(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]], np.float32)


@pytest.fixture
def synthetic_ba(rng):
    """Exact synthetic BA problem: shared world points, per-camera core-grid
    sections holding each camera's exact projected pixels + depths, so every
    correspondence has zero residual at the ground-truth poses."""
    c, npts = 6, 40
    f = 100.0
    pps = np.full((c, 2), 64.0, np.float32)

    cam2w = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    for i in range(c):
        cam2w[i, :3, :3] = _rotz(0.05 * i)
        cam2w[i, :3, 3] = [0.25 * i, 0.04 * i, -0.1 * i]

    world = rng.uniform(-1.5, 1.5, size=(npts, 3)).astype(np.float32)
    world[:, 2] += 6.0

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
    for i in range(1, c):
        for k in range(npts):
            img1.append(0)
            idx1.append(k)                     # camera 0's section
            img2.append(i)
            idx2.append(i * npts + k)          # camera i's section
    return dict(cam2w=cam2w, focals=np.full((c,), f, np.float32), pps=pps,
                depths=depths, core_pix=core_pix,
                img1=np.array(img1, np.int32),
                idx1=np.array(idx1, np.int32),
                img2=np.array(img2, np.int32),
                idx2=np.array(idx2, np.int32),
                conf=np.ones(len(img1), np.float32))


def _perturb(cam2w, rng, rot=0.03, tr=0.08):
    out = cam2w.copy()
    for i in range(1, cam2w.shape[0]):  # cam0 is the gauge anchor
        out[i, :3, :3] = _rotz(rng.normal() * rot) @ out[i, :3, :3]
        out[i, :3, 3] += rng.normal(size=3) * tr
    return out


def test_lm_recovers_planted_poses(synthetic_ba, rng):
    d = synthetic_ba
    noisy = _perturb(d["cam2w"], rng)
    out, focals, costs = lm_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["img1"], d["idx1"], d["img2"], d["idx2"], d["conf"],
        iters=12, opt_focal=False)
    assert costs[-1] < 1e-4 * costs[0], costs   # exact problem -> ~0 cost
    t_err = np.linalg.norm(out[:, :3, 3] - d["cam2w"][:, :3, 3], axis=1)
    assert t_err.max() < 1e-2, t_err
    r_err = np.linalg.norm(out[:, :3, :3] - d["cam2w"][:, :3, :3],
                           axis=(1, 2))
    assert r_err.max() < 1e-2, r_err


def test_lm_sharded_matches_single(synthetic_ba, rng):
    d = synthetic_ba
    noisy = _perturb(d["cam2w"], rng)
    kw = dict(iters=3, opt_focal=False)
    out1, _, costs1 = lm_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["img1"], d["idx1"], d["img2"], d["idx2"], d["conf"], **kw)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    out8, _, costs8 = lm_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["img1"], d["idx1"], d["img2"], d["idx2"], d["conf"],
        mesh=mesh, **kw)
    # atol floor: near-zero converged costs differ only by summation order
    np.testing.assert_allclose(costs1, costs8, rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(out1, out8, atol=1e-3)


def test_chain_to_absolute_roundtrip(rng):
    c = 4
    cam2w = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    for i in range(c):
        cam2w[i, :3, :3] = _rotz(0.3 * i)
        cam2w[i, :3, 3] = rng.normal(size=3)
    st = chain_to_absolute(jnp.asarray(cam2w), jnp.full((c,), 50.0))
    R = np.asarray(quat_to_rotmat(st.quats))
    np.testing.assert_allclose(R, cam2w[:, :3, :3], atol=1e-5)
    np.testing.assert_allclose(np.exp(st.log_focals), 50.0, rtol=1e-6)
