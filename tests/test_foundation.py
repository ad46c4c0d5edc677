"""Schedules, robust losses, camera math, SSIM, checkpoint, metrics."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from starst3r_tpu.ops.ssim import psnr, ssim
from starst3r_tpu.utils.camera import (estimate_focal_from_pointmap,
                                       make_intrinsics, pixel_grid,
                                       project_points, reproj2d,
                                       unproject_depth)
from starst3r_tpu.utils.checkpoint import (restore_pytree, save_pytree,
                                           tree_prefix_overwrite)
from starst3r_tpu.utils.schedules import (cosine_schedule, gamma_loss,
                                          meta_gamma_loss)


def test_cosine_schedule_endpoints():
    assert float(cosine_schedule(0.0, 0.07)) == pytest.approx(0.07)
    assert float(cosine_schedule(1.0, 0.07)) == pytest.approx(0.0, abs=1e-9)
    assert float(cosine_schedule(0.5, 0.07)) == pytest.approx(0.035)


def test_gamma_loss_monotone():
    d = jnp.array([0.0, 0.1, 1.0, 10.0])
    out = np.asarray(gamma_loss(d, 0.4))
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    assert np.all(np.diff(out) > 0)


def test_meta_gamma_anneal():
    d = jnp.array([2.0])
    # alpha=1 -> plain L1-ish; alpha=0 -> |d|^gamma
    full = float(meta_gamma_loss(d, 0.4, 1.0)[0])
    annealed = float(meta_gamma_loss(d, 0.4, 0.0)[0])
    assert full > annealed  # 2.0^1 > 2.0^0.4


def test_project_unproject_roundtrip(rng):
    h, w = 16, 24
    K = make_intrinsics(jnp.asarray(30.0), jnp.asarray([12.0, 8.0]))
    pix = pixel_grid(h, w)
    depth = jnp.asarray(rng.uniform(1.0, 5.0, size=(h * w,)).astype(np.float32))
    pts = unproject_depth(depth, K, pix=pix)
    uv, z = project_points(pts, K)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(pix), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-4)


def test_reproj2d_matches_project(rng):
    K = np.asarray(make_intrinsics(jnp.asarray(50.0), jnp.asarray([32.0, 32.0])))
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.1, -0.2, 0.3]
    pts = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    proj = jnp.asarray(K) @ jnp.asarray(w2c[:3])
    uv = np.asarray(reproj2d(proj, jnp.asarray(pts)))
    uv2, _ = project_points(jnp.asarray(pts), jnp.asarray(K),
                            w2c=jnp.asarray(w2c))
    np.testing.assert_allclose(uv, np.asarray(uv2), atol=1e-3)


def test_focal_estimation_recovers_truth(rng):
    h, w, f = 32, 48, 55.0
    K = make_intrinsics(jnp.asarray(f), jnp.asarray([w / 2, h / 2]))
    pix = pixel_grid(h, w)
    depth = jnp.asarray(rng.uniform(2.0, 6.0, size=(h * w,)).astype(np.float32))
    pts = unproject_depth(depth, K, pix=pix).reshape(h, w, 3)
    est = float(estimate_focal_from_pointmap(pts, jnp.asarray([w / 2, h / 2])))
    assert est == pytest.approx(f, rel=1e-3)


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_degrades(rng):
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    noisy = jnp.clip(img + 0.3 * jnp.asarray(
        rng.normal(size=(32, 32, 3)).astype(np.float32)), 0, 1)
    assert float(ssim(img, noisy)) < 0.8


def test_ssim_matches_torchmetrics(rng):
    torch = pytest.importorskip("torch")
    tm = pytest.importorskip("torchmetrics.image")
    a = rng.uniform(size=(1, 3, 40, 40)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    ref = tm.StructuralSimilarityIndexMeasure(data_range=1.0)(
        torch.tensor(b), torch.tensor(a)).item()
    ours = float(ssim(jnp.asarray(a[0].transpose(1, 2, 0)),
                      jnp.asarray(b[0].transpose(1, 2, 0))))
    assert ours == pytest.approx(ref, abs=2e-3)


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4, np.int32)}}
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, tree)
    like = {"a": np.zeros((2, 3), np.float32),
            "b": {"c": np.zeros(4, np.int32)}}
    out = restore_pytree(path, like)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])


def test_tree_prefix_overwrite():
    new = {"x": jnp.zeros((5, 2)), "y": jnp.zeros((5,))}
    prev = {"x": jnp.ones((3, 2)), "y": jnp.ones((3,))}
    out = tree_prefix_overwrite(new, prev)
    np.testing.assert_array_equal(np.asarray(out["x"][:3]), np.ones((3, 2)))
    np.testing.assert_array_equal(np.asarray(out["x"][3:]), np.zeros((2, 2)))
    np.testing.assert_array_equal(np.asarray(out["y"][:3]), np.ones(3))
