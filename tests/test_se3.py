import jax.numpy as jnp
import numpy as np
import pytest

from starst3r_tpu.utils.se3 import (
    interp_se3, interp_se3_path, quat_mul, quat_normalize, quat_slerp,
    quat_to_rotmat, rotmat_to_quat, se3_apply, se3_from_quat_trans,
    se3_inverse,
)


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotmat_roundtrip(rng):
    q = random_quat(rng, (32,))
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(rotmat_to_quat(R))
    # q and -q are the same rotation
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_rotmat_orthonormal(rng):
    q = random_quat(rng, (16,))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_quat_mul_matches_rotmat(rng):
    a = random_quat(rng)
    b = random_quat(rng)
    Rab = np.asarray(quat_to_rotmat(quat_mul(jnp.asarray(a), jnp.asarray(b))))
    Ra = np.asarray(quat_to_rotmat(jnp.asarray(a)))
    Rb = np.asarray(quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-6)


def test_se3_inverse(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3))
    M = se3_from_quat_trans(jnp.asarray(q), jnp.asarray(t))
    Minv = se3_inverse(M)
    eye = np.asarray(M @ Minv)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_se3_apply(rng):
    q = random_quat(rng)
    t = rng.normal(size=3)
    pts = rng.normal(size=(10, 3))
    M = se3_from_quat_trans(jnp.asarray(q), jnp.asarray(t))
    out = np.asarray(se3_apply(M, jnp.asarray(pts)))
    expect = pts @ np.asarray(quat_to_rotmat(jnp.asarray(q))).T + t
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_interp_se3_endpoints(rng):
    q1, q2 = random_quat(rng), random_quat(rng)
    m1 = np.asarray(se3_from_quat_trans(jnp.asarray(q1), jnp.zeros(3)))
    m2 = np.asarray(se3_from_quat_trans(jnp.asarray(q2), jnp.ones(3)))
    for mode in ("lerp", "slerp"):
        a = np.asarray(interp_se3(jnp.asarray(m1), jnp.asarray(m2), 0.0, mode))
        b = np.asarray(interp_se3(jnp.asarray(m1), jnp.asarray(m2), 1.0, mode))
        np.testing.assert_allclose(a, m1, atol=1e-5)
        np.testing.assert_allclose(b, m2, atol=1e-5)


def test_interp_se3_midpoint_orthonormal(rng):
    """The reference lerps + Gram-Schmidts (starster/utils.py:42-54); the
    result must still be a valid rotation at any factor."""
    q1, q2 = random_quat(rng), random_quat(rng)
    m1 = np.asarray(se3_from_quat_trans(jnp.asarray(q1), jnp.zeros(3)))
    m2 = np.asarray(se3_from_quat_trans(jnp.asarray(q2), jnp.ones(3)))
    mid = np.asarray(interp_se3(jnp.asarray(m1), jnp.asarray(m2), 0.37))
    R = mid[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert mid[3, 3] == 1.0


def test_interp_se3_path_shape(rng):
    q1, q2 = random_quat(rng), random_quat(rng)
    m1 = se3_from_quat_trans(jnp.asarray(q1), jnp.zeros(3))
    m2 = se3_from_quat_trans(jnp.asarray(q2), jnp.ones(3))
    path = np.asarray(interp_se3_path(m1, m2, 7))
    assert path.shape == (7, 4, 4)
    np.testing.assert_allclose(path[0], np.asarray(m1), atol=1e-5)
    np.testing.assert_allclose(path[-1], np.asarray(m2), atol=1e-5)


def test_slerp_halfway(rng):
    """Slerp at t=0.5 of a 90-degree rotation is the 45-degree rotation."""
    q0 = jnp.array([1.0, 0, 0, 0])
    q90 = jnp.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])
    q45 = np.asarray(quat_slerp(q0, q90, 0.5))
    expect = np.array([np.cos(np.pi / 8), np.sin(np.pi / 8), 0, 0])
    np.testing.assert_allclose(q45, expect, atol=1e-6)
