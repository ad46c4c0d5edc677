"""SO(3)/SE(3) math in pure jnp.

Self-contained rotation module (no external rotation dep): quaternions use the
**wxyz** convention throughout, matching the reference's Gaussian ``quats``
(reference: starster/gs.py:28 sets quats[:,0]=1) and its GA pose quaternions
via `roma` (reference: starster/reconstruct.py:183,229 — roma is xyzw; we keep
one internal convention and convert at any boundary that needs it).

Also provides the camera-path interpolation utilities mirroring the reference
API (`interp_se3`, `interp_se3_path` — reference: starster/utils.py:36-78).
The reference lerps rotation-matrix columns + Gram-Schmidt instead of slerp
(SURVEY §2a quirk 4); we reproduce that behavior by default (``mode='lerp'``)
and offer proper slerp behind ``mode='slerp'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = (
    "quat_normalize",
    "quat_to_rotmat",
    "rotmat_to_quat",
    "quat_mul",
    "quat_slerp",
    "se3_from_quat_trans",
    "se3_inverse",
    "se3_compose",
    "se3_apply",
    "interp_se3",
    "interp_se3_path",
)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) (..., 4) to unit norm."""
    # sqrt(sum + eps) rather than norm + clamp: jnp.linalg.norm's VJP is
    # NaN at exactly 0 even when maximum() would discard that branch.
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], -2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [w,x,y,z].

    Branchless Shepperd-style: compute all four candidate quaternions and pick
    the numerically best by largest denominator (jit/grad friendly, no cond).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, one per dominant component
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5  # |w|, |x|, |y|, |z| candidates

    # candidate 0: w dominant
    c0 = jnp.stack([qw[..., 0],
                    (m21 - m12) / (4 * qw[..., 0]),
                    (m02 - m20) / (4 * qw[..., 0]),
                    (m10 - m01) / (4 * qw[..., 0])], -1)
    # candidate 1: x dominant
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]),
                    qw[..., 1],
                    (m01 + m10) / (4 * qw[..., 1]),
                    (m02 + m20) / (4 * qw[..., 1])], -1)
    # candidate 2: y dominant
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]),
                    (m01 + m10) / (4 * qw[..., 2]),
                    qw[..., 2],
                    (m12 + m21) / (4 * qw[..., 2])], -1)
    # candidate 3: z dominant
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]),
                    (m02 + m20) / (4 * qw[..., 3]),
                    (m12 + m21) / (4 * qw[..., 3]),
                    qw[..., 3]], -1)

    cands = jnp.stack([c0, c1, c2, c3], -2)           # (..., 4 cand, 4)
    best = jnp.argmax(qw, axis=-1)                     # (...,)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [w,x,y,z]."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation of unit quaternions (shortest arc)."""
    a = quat_normalize(a)
    b = quat_normalize(b)
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # fall back to lerp near theta ~ 0
    small = sin_theta < 1e-6
    w_a = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w_b = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w_a * a + w_b * b)


def se3_from_quat_trans(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quat + (..., 3) trans -> (..., 4, 4) SE3 matrix."""
    R = quat_to_rotmat(q)
    batch = R.shape[:-2]
    M = jnp.zeros(batch + (4, 4), R.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(t)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of SE3 matrices (..., 4, 4) — avoids linalg.inv
    (reference uses batched torch.inverse: starster/scene.py:95)."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(M)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def se3_apply(M: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 (..., 4, 4) to points (..., N, 3) (reference `geotrf` analog,
    call site starster/reconstruct.py:320)."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def interp_se3(mat1: jnp.ndarray, mat2: jnp.ndarray, fac,
               mode: str = "lerp") -> jnp.ndarray:
    """Interpolate between two SE3 matrices (4, 4).

    ``mode='lerp'`` reproduces the reference exactly: lerp translation, lerp
    rotation columns, Gram-Schmidt re-orthogonalize + normalize
    (reference: starster/utils.py:42-54; SURVEY §2a quirk 4).
    ``mode='slerp'`` uses quaternion slerp (the fix behind a flag).
    """
    trans = mat1[:3, 3] + (mat2[:3, 3] - mat1[:3, 3]) * fac
    if mode == "slerp":
        q = quat_slerp(rotmat_to_quat(mat1[:3, :3]), rotmat_to_quat(mat2[:3, :3]), fac)
        R = quat_to_rotmat(q)
    else:
        so3 = mat1[:3, :3] + (mat2[:3, :3] - mat1[:3, :3]) * fac
        # Modified Gram-Schmidt on columns. Deliberate fix vs the reference
        # (SURVEY §2a quirk 4 discussion): the reference subtracts
        # projections against UNNORMALIZED columns (utils.py:47-50), which
        # leaves the result slightly non-orthogonal for distant rotations;
        # we normalize each pivot first, so the output is a true rotation.
        c0 = so3[:, 0]
        c0 = c0 / jnp.maximum(jnp.linalg.norm(c0), 1e-12)
        c1 = so3[:, 1] - c0 * jnp.dot(c0, so3[:, 1])
        c1 = c1 / jnp.maximum(jnp.linalg.norm(c1), 1e-12)
        c2 = so3[:, 2] - c0 * jnp.dot(c0, so3[:, 2])
        c2 = c2 - c1 * jnp.dot(c1, c2)
        c2 = c2 / jnp.maximum(jnp.linalg.norm(c2), 1e-12)
        R = jnp.stack([c0, c1, c2], axis=1)
    out = jnp.zeros_like(mat1)
    out = out.at[:3, :3].set(R)
    out = out.at[:3, 3].set(trans)
    out = out.at[3, 3].set(1.0)
    return out


def interp_se3_path(mat1: jnp.ndarray, mat2: jnp.ndarray, steps: int,
                    mode: str = "lerp") -> jnp.ndarray:
    """Stack of ``steps`` interpolations with linspace factors
    (reference: starster/utils.py:57-78). Vectorized via vmap."""
    facs = jnp.linspace(0.0, 1.0, steps)
    return jax.vmap(lambda f: interp_se3(mat1, mat2, f, mode=mode))(facs)
