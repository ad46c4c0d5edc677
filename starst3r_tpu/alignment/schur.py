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

__all__ = ("Tracks", "build_tracks", "schur_refine",
           "schur_partition_sizes")

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
                          core_pix, pps, depths, c: int,
                          chunk: int = 2048):
    """Partial (S, g, cost) of a track shard — scatter-free.

    tracks_* (Ms, K). Returns S (C*8, C*8), g (C*8,), cost scalar.

    TPU mapping (VERDICT r2 weak #3: `.at[].add` scatters serialize on
    TPU): every reduction is a matmul against a one-hot camera matrix, and
    the Schur correction -sum_m G_m^T G_m / wsum_m is realized as -V^T V
    with V the (3·Mc, C·8) stack of per-track per-camera aggregated
    weighted Jacobians V_m[:, c·8:] = sum_{k: cam_k=c} w_k J_k / sqrt(wsum)
    — ONE MXU GEMM per chunk instead of Ms·K² scatter-added 8x8 blocks.
    Tracks stream through a lax.scan in ``chunk``-sized slices so the
    one-hot / V intermediates stay small at 200-keyframe scale.
    """
    ms, k = tracks_cam.shape
    hi = jax.lax.Precision.HIGHEST
    pad = (-ms) % chunk
    if pad:
        tracks_cam = jnp.concatenate(
            [tracks_cam, jnp.zeros((pad, k), tracks_cam.dtype)])
        tracks_pt = jnp.concatenate(
            [tracks_pt, jnp.zeros((pad, k), tracks_pt.dtype)])
        tracks_w = jnp.concatenate(
            [tracks_w, jnp.zeros((pad, k), tracks_w.dtype)])
    n_chunks = tracks_cam.shape[0] // chunk
    xs = (tracks_cam.reshape(n_chunks, chunk, k),
          tracks_pt.reshape(n_chunks, chunk, k),
          tracks_w.reshape(n_chunks, chunk, k))

    def body(carry, x):
        s_corr, s_diag, g, cost = carry
        tc, tp, w = x                                       # (Mc, K)
        W, J = jax.vmap(_world_and_jac,
                        in_axes=(None, 0, 0, None, None, None))(
            thetas, tc.reshape(-1), tp.reshape(-1), core_pix, pps, depths)
        W = W.reshape(chunk, k, 3)
        J = J.reshape(chunk, k, 3, _NP)
        # zero invalid slots entirely (their J would be real otherwise)
        J = J * (w > 0)[..., None, None]
        oh = jax.nn.one_hot(tc, c, dtype=jnp.float32)       # (Mc, K, C)
        oh = oh * (w > 0)[..., None]

        wsum = jnp.maximum(w.sum(axis=1), 1e-12)            # (Mc,)
        x_star = (w[..., None] * W).sum(axis=1) / wsum[:, None]
        r = W - x_star[:, None, :]                          # (Mc, K, 3)
        cost = cost + 0.5 * jnp.sum(w * jnp.sum(r * r, axis=-1))

        # gradient: g_c += w J^T r (r centered -> point term vanishes);
        # one-hot GEMM instead of a scatter-add
        g_obs = jnp.einsum("mkdi,mkd,mk->mki", J, r, w, precision=hi)
        g = g + jnp.einsum("mki,mkc->ci", g_obs, oh, precision=hi)

        # diagonal observation term: w J^T J per camera (one-hot GEMM)
        diag_blk = jnp.einsum("mkdi,mkdj,mk->mkij", J, J, w, precision=hi)
        s_diag = s_diag + jnp.einsum("mkij,mkc->cij", diag_blk, oh,
                                     precision=hi)

        # Schur correction: V_m = G_m / sqrt(wsum) row-blocks, -V^T V GEMM
        wj = J * w[..., None, None]                         # (Mc, K, 3, 8)
        V = jnp.einsum("mkdi,mkc->mdci", wj, oh,
                       precision=hi) / jnp.sqrt(wsum)[:, None, None, None]
        Vf = V.reshape(chunk * 3, c * _NP)
        s_corr = s_corr - jnp.matmul(Vf.T, Vf, precision=hi)
        return (s_corr, s_diag, g, cost), None

    # fold a (zero) term of the shard data into the init so the carry is
    # marked as varying over the shard_map axis (pvary), matching the body
    # outputs when this runs inside shard_map
    z = tracks_w.reshape(-1)[0] * 0.0
    init = (jnp.zeros((c * _NP, c * _NP), jnp.float32) + z,
            jnp.zeros((c, _NP, _NP), jnp.float32) + z,
            jnp.zeros((c, _NP), jnp.float32) + z,
            jnp.asarray(0.0, jnp.float32) + z)
    (s_corr, s_diag, g, cost), _ = jax.lax.scan(body, init, xs)

    # place the C diagonal 8x8 blocks (tiny, static) and add the correction
    S = s_corr.reshape(c, _NP, c, _NP)
    S = S.at[jnp.arange(c), :, jnp.arange(c), :].add(s_diag)
    return S.reshape(c * _NP, c * _NP), g.reshape(-1), cost


def schur_partition_sizes(tracks: "Tracks", n_dev: int) -> list:
    """Valid-observation count per device shard under the keyframe-block
    track partitioning `schur_refine(mesh=...)` uses (tracks padded to a
    multiple of n_dev, then split contiguously over the mesh axis).
    Work-balance diagnostic (VERDICT r4 #7): recorded in bench aux and
    asserted near-equal in tests/test_distributed.py."""
    m = tracks.cam.shape[0]
    pad = (-m) % n_dev
    w = np.concatenate(
        [tracks.w, np.zeros((pad,) + tracks.w.shape[1:], np.float32)])
    per = w.reshape(n_dev, -1, w.shape[-1])
    return [int((s > 0).sum()) for s in per]


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
