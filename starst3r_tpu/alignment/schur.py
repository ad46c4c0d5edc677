"""Schur-complement bundle adjustment over keyframe blocks (BASELINE
configs 4-5; SURVEY §2c "BA / global alignment" scale path and §7 item 4
"Distributed Schur-complement BA").

Formulation. Pairwise 3D-3D correspondences are merged transitively into
TRACKS (union-find over (camera, core-point) endpoints): every observation
(camera k, core pixel, fixed GA depth) of track m claims the same latent
world point X_m. With residuals r_k = X_m - W_k(theta_k) the point
Jacobian is the identity, so the point blocks of the normal equations are
C_m = (sum_k w_k) I — the Schur complement eliminating ALL world points is
closed-form and exact:

    S    = sum_k w_k J_k^T J_k  -  sum_m G_m^T G_m / wsum_m
    g    = sum_k w_k J_k^T r_k          (with r_k = W_k - X*_m,
    X*_m = sum_k w_k W_k / wsum_m        the eliminated optimum, so the
                                         E C^{-1} g_p term vanishes)
    G_m  = sum_k w_k J_k                 (3 x 8 per track, segment sum)

i.e. Gauss-Newton on F(theta) = min_X sum w |X - W(theta)|^2 — the
per-track weighted variance. Cameras are 8-parameter blocks (quat 4 +
trans 3 + log-focal); camera 0 is frozen for gauge.

TPU mapping: observations and tracks are padded flat arrays; J_k via
vmapped jacfwd; the reduction is two segment-sums plus one scatter-add of
8x8 blocks into the (C,8,C,8) reduced system; under a mesh the
observation/track shards are reduced with `psum` over ICI (shard_map) and
the tiny (8C)^2 solve is replicated. Keyframe partitioning = sharding the
track axis; no step of the math depends on which device owns which
keyframe block.

Relationship to `lm.py`: lm_refine is the dense two-view normal-equation
solver (every correspondence an independent two-camera residual). This
module subsumes it at scale: multi-view tracks share one latent point, so
a core point seen by 10 keyframes contributes rank-1 structure instead of
45 independent pair terms.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.se3 import quat_normalize, quat_to_rotmat, rotmat_to_quat

__all__ = ("Tracks", "build_tracks", "schur_refine")

_NP = 8  # per-camera params: quat(4) + trans(3) + log_focal(1)


class Tracks(NamedTuple):
    """Padded track observations. M tracks x K observation slots."""

    cam: np.ndarray      # (M, K) int32 camera index (0 where invalid)
    pt: np.ndarray       # (M, K) int32 core-grid index
    w: np.ndarray        # (M, K) float32 confidence weight, 0 = invalid


def build_tracks(corr_img1, corr_idx1, corr_img2, corr_idx2, corr_conf,
                 n_cams: int, core_size: int, max_obs: int = 8,
                 min_obs: int = 2) -> Tracks:
    """Union-find merge of correspondence endpoints into tracks.

    Node id = cam * core_size + core_idx. Zero-conf correspondences are
    ignored. Observation weight = max conf of any correspondence touching
    that endpoint. Tracks are padded to ``max_obs`` slots; tracks with more
    observations are SPLIT into camera-ordered sub-tracks with one
    overlapping observation (a chain), so every keyframe stays constrained
    — this is the keyframe-block partitioning of long tracks (BASELINE
    config 4).
    """
    n_nodes = n_cams * core_size
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    conf = np.asarray(corr_conf, np.float32)
    keep = conf > 0
    n1 = (np.asarray(corr_img1, np.int64) * core_size
          + np.asarray(corr_idx1, np.int64))[keep]
    n2 = (np.asarray(corr_img2, np.int64) * core_size
          + np.asarray(corr_idx2, np.int64))[keep]
    wk = conf[keep]
    for a, b in zip(n1, n2):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    node_w = np.zeros(n_nodes, np.float32)
    np.maximum.at(node_w, n1, wk)
    np.maximum.at(node_w, n2, wk)
    nodes = np.nonzero(node_w > 0)[0]
    roots = np.array([find(a) for a in nodes])
    order = np.argsort(roots, kind="stable")
    nodes, roots = nodes[order], roots[order]
    starts = np.nonzero(np.r_[True, roots[1:] != roots[:-1]])[0]
    ends = np.r_[starts[1:], len(roots)]

    cams, pts, ws = [], [], []

    def emit(grp, gw):
        pad = max_obs - len(grp)
        cams.append(np.r_[grp // core_size, np.zeros(pad, np.int64)])
        pts.append(np.r_[grp % core_size, np.zeros(pad, np.int64)])
        ws.append(np.r_[gw, np.zeros(pad, np.float32)])

    for s, e in zip(starts, ends):
        grp = nodes[s:e]
        if len(grp) < min_obs:
            continue
        gw = node_w[grp]
        order2 = np.argsort(grp // core_size)  # camera order (chain)
        grp, gw = grp[order2], gw[order2]
        if len(grp) <= max_obs:
            emit(grp, gw)
        else:
            step_ = max_obs - 1  # one-obs overlap links the sub-tracks
            for s0 in range(0, len(grp) - 1, step_):
                part = slice(s0, min(s0 + max_obs, len(grp)))
                if part.stop - part.start >= min_obs:
                    emit(grp[part], gw[part])
    if not cams:
        z = np.zeros((0, max_obs))
        return Tracks(z.astype(np.int32), z.astype(np.int32),
                      z.astype(np.float32))
    return Tracks(np.stack(cams).astype(np.int32),
                  np.stack(pts).astype(np.int32),
                  np.stack(ws).astype(np.float32))


def _world_and_jac(thetas, cam, pt, core_pix, pps, depths):
    """World point W and 8-param Jacobian for one observation.

    thetas (C, 8); returns (W (3,), J (3, 8))."""
    pix = core_pix[pt]
    pp = pps[cam]
    z = depths[cam, pt]

    def w_of(theta):
        q = quat_normalize(theta[:4])
        R = quat_to_rotmat(q)
        t = theta[4:7]
        f = jnp.exp(theta[7])
        xy = (pix - pp) / f * z
        cam_pt = jnp.concatenate([xy, z[None]], axis=0)
        return R @ cam_pt + t

    theta = thetas[cam]
    return w_of(theta), jax.jacfwd(w_of)(theta)


def _shard_reduced_system(thetas, tracks_cam, tracks_pt, tracks_w,
                          core_pix, pps, depths, c: int):
    """Partial (S, g, cost) of a track shard.

    tracks_* (Ms, K). Returns S (C*8, C*8), g (C*8,), cost scalar.
    """
    ms, k = tracks_cam.shape
    flat_cam = tracks_cam.reshape(-1)
    flat_pt = tracks_pt.reshape(-1)
    w = tracks_w.reshape(ms, k)

    W, J = jax.vmap(_world_and_jac, in_axes=(None, 0, 0, None, None, None))(
        thetas, flat_cam, flat_pt, core_pix, pps, depths)
    W = W.reshape(ms, k, 3)
    J = J.reshape(ms, k, 3, _NP)
    # zero invalid slots entirely (their J would be real otherwise)
    J = J * (w > 0)[..., None, None]

    wsum = jnp.maximum(w.sum(axis=1), 1e-12)              # (Ms,)
    x_star = (w[..., None] * W).sum(axis=1) / wsum[:, None]
    r = W - x_star[:, None, :]                            # (Ms, K, 3)
    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

    # gradient: g_cam += w J^T r  (r already centered -> point term vanishes)
    g_obs = jnp.einsum("mkdi,mkd,mk->mki", J, r, w)       # (Ms, K, 8)
    g = jnp.zeros((c, _NP), jnp.float32).at[flat_cam].add(
        g_obs.reshape(-1, _NP))

    # diagonal observation term: w J^T J into (cam, cam) blocks
    diag_blk = jnp.einsum("mkdi,mkdj,mk->mkij", J, J, w)  # (Ms, K, 8, 8)
    S = jnp.zeros((c, c, _NP, _NP), jnp.float32)
    S = S.at[flat_cam, flat_cam].add(diag_blk.reshape(-1, _NP, _NP))

    # Schur correction: - G^T G / wsum with G_m = sum_k w_k J_k, realized
    # per ordered obs pair (a, b) as -(w_a J_a)^T (w_b J_b) / wsum and
    # scatter-added into the (cam_a, cam_b) block
    wj = jnp.einsum("mkdi,mk->mkdi", J, w)                # (Ms, K, 3, 8)
    pair_blk = -jnp.einsum("madi,mbdj,m->mabij", wj, wj, 1.0 / wsum)
    cam_a = jnp.broadcast_to(tracks_cam[:, :, None], (ms, k, k))
    cam_b = jnp.broadcast_to(tracks_cam[:, None, :], (ms, k, k))
    S = S.at[cam_a.reshape(-1), cam_b.reshape(-1)].add(
        pair_blk.reshape(-1, _NP, _NP))
    S = S.transpose(0, 2, 1, 3).reshape(c * _NP, c * _NP)
    return S, g.reshape(-1), cost


def schur_refine(
    cam2w: np.ndarray,
    focals: np.ndarray,
    pps: np.ndarray,
    depths: np.ndarray,
    core_pix: np.ndarray,
    tracks: Tracks,
    iters: int = 10,
    damping: float = 1e-3,
    mesh=None,
    opt_focal: bool = True,
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Damped Gauss-Newton on the Schur-reduced camera system.

    cam2w (C,4,4), focals (C,), pps (C,2) pixel principal points,
    depths (C,S) fixed metric core depth, core_pix (S,2). ``mesh``:
    optional 1-axis Mesh — tracks are sharded over its first axis
    (keyframe-block partitioning of the reduction) and the partial
    (S, g, cost) are `psum`-combined over ICI.

    Returns (cam2w', focals', costs per accepted iteration).
    """
    c = cam2w.shape[0]
    core_pix = jnp.asarray(core_pix, jnp.float32)
    pps = jnp.asarray(pps, jnp.float32)
    depths = jnp.asarray(depths, jnp.float32)

    m = tracks.cam.shape[0]
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = (-m) % n_dev
    else:
        pad = 0
    t_cam = np.concatenate(
        [tracks.cam, np.zeros((pad,) + tracks.cam.shape[1:], np.int32)])
    t_pt = np.concatenate(
        [tracks.pt, np.zeros((pad,) + tracks.pt.shape[1:], np.int32)])
    t_w = np.concatenate(
        [tracks.w, np.zeros((pad,) + tracks.w.shape[1:], np.float32)])
    arrs = (jnp.asarray(t_cam), jnp.asarray(t_pt), jnp.asarray(t_w))

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]

        def reduced(thetas, tc, tp, tw):
            S, g, cost = _shard_reduced_system(thetas, tc, tp, tw,
                                               core_pix, pps, depths, c)
            return (jax.lax.psum(S, axis), jax.lax.psum(g, axis),
                    jax.lax.psum(cost, axis))

        reduced = shard_map(reduced, mesh=mesh,
                            in_specs=(P(), P(axis), P(axis), P(axis)),
                            out_specs=(P(), P(), P()))
    else:
        def reduced(thetas, tc, tp, tw):
            return _shard_reduced_system(thetas, tc, tp, tw,
                                         core_pix, pps, depths, c)

    @jax.jit
    def step(thetas, lam):
        S, g, cost = reduced(thetas, *arrs)
        mask = jnp.ones((c, _NP), jnp.float32)
        mask = mask.at[0].set(0.0)                 # gauge: freeze camera 0
        if not opt_focal:
            mask = mask.at[:, 7].set(0.0)
        mask = mask.reshape(-1)
        Sm = S * mask[:, None] * mask[None, :]
        Sm = Sm + jnp.diag(lam * (jnp.diag(Sm) + 1e-8) + (1.0 - mask))
        delta = jnp.linalg.solve(Sm, -g * mask)
        return delta.reshape(c, _NP), cost

    @jax.jit
    def cost_only(thetas):
        _, _, cost = reduced(thetas, *arrs)
        return cost

    thetas = jnp.concatenate(
        [rotmat_to_quat(jnp.asarray(cam2w[:, :3, :3])),
         jnp.asarray(cam2w[:, :3, 3]),
         jnp.log(jnp.asarray(focals))[:, None]], axis=1)   # (C, 8)
    lam = damping
    costs = []
    cur = float(cost_only(thetas))
    for _ in range(iters):
        delta, _ = step(thetas, lam)
        cand = thetas + delta
        cand = cand.at[:, :4].set(quat_normalize(cand[:, :4]))
        new = float(cost_only(cand))
        if new < cur:
            thetas, cur = cand, new
            lam = max(lam * 0.5, 1e-6)
        else:
            lam = min(lam * 4.0, 1e3)
        costs.append(cur)

    q = quat_normalize(thetas[:, :4])
    R = quat_to_rotmat(q)
    out = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    out[:, :3, :3] = np.asarray(R)
    out[:, :3, 3] = np.asarray(thetas[:, 4:7])
    return out, np.exp(np.asarray(thetas[:, 7])), costs
