"""Levenberg–Marquardt bundle adjustment over absolute camera poses, with
mesh-sharded normal-equation reduction — the scale path for large keyframe
counts (BASELINE configs 4-5; SURVEY §2c "BA / global alignment" row and
§7.2 layer 5 "second optimizer (scale path)").

Relationship to `ga.py`: the Adam GA (the reference's algorithm,
reconstruct.py:371-401) optimizes a *chained* (MST-relative) parameterization
— great for initialization, but every camera's world pose depends on all its
chain ancestors, so second-order methods lose their block sparsity. Here we
re-parameterize to absolute poses (root camera frozen for gauge) and run
damped Gauss–Newton: each 3D-3D correspondence touches exactly two cameras,
so J^T J is block-sparse; we assemble the dense normal matrix H (8 params
per camera: quat 4 + trans 3 + log-focal 1 — small for <=few hundred
keyframes) from per-correspondence outer products.

Distribution: correspondences are sharded along the mesh data axis inside
`shard_map`; each device reduces its shard's (H, g, cost) contribution and a
`psum` combines them over ICI — the keyframe-block reduction pattern
(SURVEY §5 long-context row). The (8C)^2 solve is replicated (tiny).

Depth handling: core depths are held fixed at their GA values (the reference
default opt_depth=False, reconstruct.py:66). Eliminating optimized depths
via a Schur complement is the natural extension once opt_depth paths matter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.se3 import quat_normalize, quat_to_rotmat

__all__ = ("LMState", "lm_refine", "chain_to_absolute")


class LMState(NamedTuple):
    quats: jnp.ndarray       # (C, 4) absolute cam2w rotation (wxyz)
    trans: jnp.ndarray       # (C, 3) absolute cam2w translation
    log_focals: jnp.ndarray  # (C,)


def chain_to_absolute(cam2w: jnp.ndarray, focals: jnp.ndarray) -> LMState:
    """Build LM state from (C,4,4) cam2w + (C,) focals (GA output)."""
    from ..utils.se3 import rotmat_to_quat
    return LMState(quats=rotmat_to_quat(cam2w[:, :3, :3]),
                   trans=cam2w[:, :3, 3],
                   log_focals=jnp.log(focals))


def _cam_pts(state: LMState, cam_idx, pt_idx, core_pix, pps, depths):
    """World points for (cam_idx, pt_idx) correspondence endpoints.

    core_pix: (S, 2); pps: (C, 2) principal points (pixels, fixed);
    depths: (C, S) fixed metric core depth.
    Returns (M, 3).
    """
    q = quat_normalize(state.quats[cam_idx])          # (M, 4)
    R = quat_to_rotmat(q)                             # (M, 3, 3)
    t = state.trans[cam_idx]                          # (M, 3)
    f = jnp.exp(state.log_focals[cam_idx])            # (M,)
    pix = core_pix[pt_idx]                            # (M, 2)
    pp = pps[cam_idx]                                 # (M, 2)
    z = depths[cam_idx, pt_idx]                       # (M,)
    xy = (pix - pp) / f[:, None] * z[:, None]
    cam = jnp.concatenate([xy, z[:, None]], axis=-1)  # (M, 3)
    return jnp.einsum("mij,mj->mi", R, cam) + t


def _pack(state: LMState) -> jnp.ndarray:
    return jnp.concatenate([state.quats.reshape(-1), state.trans.reshape(-1),
                            state.log_focals], axis=0)


def _unpack(vec: jnp.ndarray, c: int) -> LMState:
    q = vec[: 4 * c].reshape(c, 4)
    t = vec[4 * c: 7 * c].reshape(c, 3)
    f = vec[7 * c:]
    return LMState(q, t, f)


_NP = 8  # per-camera params: quat(4) + trans(3) + log_focal(1)


def _residual_one(theta_i, theta_j, pix_i, pix_j, pp_i, pp_j, z_i, z_j,
                  core_pix):
    """3-vector residual of one correspondence given the two cameras' packed
    (8,) params. Depths/pps fixed."""
    def unproject(theta, pix, pp, z):
        q = quat_normalize(theta[:4])
        R = quat_to_rotmat(q)
        t = theta[4:7]
        f = jnp.exp(theta[7])
        xy = (pix - pp) / f * z
        cam = jnp.concatenate([xy, z[None]], axis=0)
        return R @ cam + t

    return unproject(theta_i, pix_i, pp_i, z_i) - \
        unproject(theta_j, pix_j, pp_j, z_j)


def _shard_normal_eqs(thetas, img1, idx1, img2, idx2, conf, core_pix, pps,
                      depths, c: int):
    """(H, g, cost) contribution of a correspondence shard.

    thetas: (C, 8). Returns H (C*8, C*8), g (C*8,), cost scalar.
    """
    pix1 = core_pix[idx1]
    pix2 = core_pix[idx2]
    pp1 = pps[img1]
    pp2 = pps[img2]
    z1 = depths[img1, idx1]
    z2 = depths[img2, idx2]
    th1 = thetas[img1]
    th2 = thetas[img2]

    def res_fn(t1, t2, p1, p2, q1, q2, zz1, zz2):
        return _residual_one(t1, t2, p1, p2, q1, q2, zz1, zz2, core_pix)

    r = jax.vmap(res_fn)(th1, th2, pix1, pix2, pp1, pp2, z1, z2)  # (M, 3)
    J1, J2 = jax.vmap(jax.jacfwd(res_fn, argnums=(0, 1)))(
        th1, th2, pix1, pix2, pp1, pp2, z1, z2)                   # (M, 3, 8)

    w = conf                                                      # (M,)
    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

    # assemble into the dense (C*8, C*8) normal matrix with index adds
    wr = w[:, None] * r                                           # (M, 3)
    g = jnp.zeros((c * _NP,), jnp.float32)
    H = jnp.zeros((c * _NP, c * _NP), jnp.float32)

    JtJ11 = jnp.einsum("mdi,mdj,m->mij", J1, J1, w)
    JtJ22 = jnp.einsum("mdi,mdj,m->mij", J2, J2, w)
    JtJ12 = jnp.einsum("mdi,mdj,m->mij", J1, J2, w)
    Jtr1 = jnp.einsum("mdi,md->mi", J1, wr)
    Jtr2 = jnp.einsum("mdi,md->mi", J2, wr)

    def block_ix(img):
        base = img * _NP
        return base[:, None] + jnp.arange(_NP)[None, :]           # (M, 8)

    bi = block_ix(img1)
    bj = block_ix(img2)
    g = g.at[bi].add(Jtr1)
    g = g.at[bj].add(Jtr2)
    H = H.at[bi[:, :, None], bi[:, None, :]].add(JtJ11)
    H = H.at[bj[:, :, None], bj[:, None, :]].add(JtJ22)
    H = H.at[bi[:, :, None], bj[:, None, :]].add(JtJ12)
    H = H.at[bj[:, :, None], bi[:, None, :]].add(
        jnp.swapaxes(JtJ12, -1, -2))
    return H, g, cost


def lm_refine(
    cam2w: np.ndarray,
    focals: np.ndarray,
    pps: np.ndarray,
    depths: np.ndarray,
    core_pix: np.ndarray,
    corr_img1: np.ndarray,
    corr_idx1: np.ndarray,
    corr_img2: np.ndarray,
    corr_idx2: np.ndarray,
    corr_conf: np.ndarray,
    iters: int = 10,
    damping: float = 1e-3,
    mesh=None,
    opt_focal: bool = True,
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Damped Gauss–Newton refinement of absolute poses (+focal).

    cam2w (C,4,4), focals (C,), pps (C,2) pixel principal points,
    depths (C,S) fixed metric core depth, core_pix (S,2), correspondence
    arrays (M,) (conf already includes matching/freeze masks, zeros ignored).
    mesh: optional 1-axis jax Mesh — correspondences are sharded over its
    first axis and reduced with psum.

    Returns (cam2w', focals', costs per iteration).
    """
    c = cam2w.shape[0]
    state = chain_to_absolute(jnp.asarray(cam2w), jnp.asarray(focals))
    core_pix = jnp.asarray(core_pix, jnp.float32)
    pps = jnp.asarray(pps, jnp.float32)
    depths = jnp.asarray(depths, jnp.float32)

    m = corr_img1.shape[0]
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-m) % n_dev
    else:
        n_dev = 1
        pad = 0
    if pad:
        corr_img1 = np.concatenate([corr_img1, np.zeros(pad, np.int32)])
        corr_idx1 = np.concatenate([corr_idx1, np.zeros(pad, np.int32)])
        corr_img2 = np.concatenate([corr_img2, np.zeros(pad, np.int32)])
        corr_idx2 = np.concatenate([corr_idx2, np.zeros(pad, np.int32)])
        corr_conf = np.concatenate([corr_conf, np.zeros(pad, np.float32)])
    arrs = tuple(jnp.asarray(a) for a in
                 (corr_img1, corr_idx1, corr_img2, corr_idx2, corr_conf))

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]

        def normal_eqs(thetas, i1, x1, i2, x2, cf):
            H, g, cost = _shard_normal_eqs(thetas, i1, x1, i2, x2, cf,
                                           core_pix, pps, depths, c)
            return (jax.lax.psum(H, axis), jax.lax.psum(g, axis),
                    jax.lax.psum(cost, axis))

        normal_eqs = shard_map(
            normal_eqs, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()))
    else:
        def normal_eqs(thetas, i1, x1, i2, x2, cf):
            return _shard_normal_eqs(thetas, i1, x1, i2, x2, cf,
                                     core_pix, pps, depths, c)

    @jax.jit
    def step(thetas, lam):
        H, g, cost = normal_eqs(thetas, *arrs)
        # gauge: freeze camera 0 (and focals if not optimized)
        mask = jnp.ones((c, _NP), jnp.float32)
        mask = mask.at[0].set(0.0)
        if not opt_focal:
            mask = mask.at[:, 7].set(0.0)
        mask = mask.reshape(-1)
        Hm = H * mask[:, None] * mask[None, :]
        Hm = Hm + jnp.diag(lam * (jnp.diag(Hm) + 1e-8) + (1.0 - mask))
        delta = jnp.linalg.solve(Hm, -g * mask)
        return delta.reshape(c, _NP), cost

    thetas = jnp.concatenate([state.quats, state.trans,
                              state.log_focals[:, None]], axis=1)  # (C, 8)
    lam = damping
    costs = []

    @jax.jit
    def cost_only(thetas):
        _, _, cost = normal_eqs(thetas, *arrs)
        return cost

    cur_cost = float(cost_only(thetas))
    for _ in range(iters):
        delta, _ = step(thetas, lam)
        cand = thetas + delta
        cand = cand.at[:, :4].set(quat_normalize(cand[:, :4]))
        new_cost = float(cost_only(cand))
        if new_cost < cur_cost:
            thetas = cand
            cur_cost = new_cost
            lam = max(lam * 0.5, 1e-6)
        else:
            lam = min(lam * 4.0, 1e3)
        costs.append(cur_cost)

    q = quat_normalize(thetas[:, :4])
    R = quat_to_rotmat(q)
    out = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    out[:, :3, :3] = np.asarray(R)
    out[:, :3, 3] = np.asarray(thetas[:, 4:7])
    return out, np.exp(np.asarray(thetas[:, 7])), costs
