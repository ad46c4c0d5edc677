"""End-to-end reconstruction driver: pairwise inference -> matching ->
canonicalization -> MST -> condensation -> two-phase global alignment.

Behavioral spec (reference: starster/reconstruct.py:19-113 `reconstruct_scene`
/ `run_sparse_ga`): complete symmetric pair graph, disk-cached pairwise
inference, canonical per-image depth, max-spanning-tree pose chain, condensed
tensors, two-phase GA with the reference's hyperparameters
(lr1=0.07/niter1=500, lr2=0.014/niter2=200, opt_depth=False,
matching_conf_thr=5, shared_intrinsics=False, subsample=8 —
reconstruct.py:60-69,80), SLAM warm-start via ``optim_params``.

The returned `Reconstruction` is the SparseGA-result analog (SURVEY §2b
"`SparseGA` result object" row): images, cam2w, intrinsics, and
`get_dense_pts3d(clean_depth=True)` with cross-view z-buffer cleaning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .alignment import (CondensedData, build_canonical_views, condense,
                        max_spanning_tree, run_global_alignment)
from .alignment.canonical import CanonicalView
from .alignment.ga import GAParams, GAResult
from .config import Config, default_config
from .imaging import make_pair_indices, make_sliding_window_pairs
from .io.cache import PairCache, content_key
from .models.mast3r import Mast3rModel, PairPrediction
from .ops.matching import PairMatches, match_pair, refine_matches
from .utils.metrics import MetricsLogger, Timer
from .utils.profiling import trace_if

__all__ = ("Reconstruction", "reconstruct_scene")


@dataclass
class Reconstruction:
    """Result container (SparseGA analog — reference reconstruct.py:113,
    consumed at scene.py:133-154)."""

    imgs: List[np.ndarray]          # (H, W, 3) float in [0, 1]
    cam2w: np.ndarray               # (C, 4, 4)
    intrinsics: np.ndarray          # (C, 3, 3)
    core_depth: np.ndarray          # (C, S) final metric core depth
    views: List[CanonicalView]      # anchors + canonical confidence
    subsample: int
    ga_params: GAParams
    losses: Tuple[float, float]

    @property
    def w2c(self) -> np.ndarray:
        from .utils.se3 import se3_inverse
        return np.asarray(se3_inverse(jnp.asarray(self.cam2w)))

    def get_dense_pts3d(self, clean_depth: bool = True):
        """Per-camera dense world points.

        Returns (pts: list of (H*W, 3), depths: list of (H*W,),
        confs: list of (H*W,)) like the reference's
        scene.get_dense_pts3d(clean_depth=True) (scene.py:148).
        """
        h, w = self.imgs[0].shape[:2]
        c = len(self.imgs)
        anchor_idx = np.stack([v.anchor_idx for v in self.views])     # (C, HW)
        offset = np.stack([v.anchor_offset for v in self.views])      # (C, HW)
        conf = np.stack([v.conf.reshape(-1) for v in self.views])     # (C, HW)
        dense_depth = np.take_along_axis(
            np.asarray(self.core_depth), anchor_idx, axis=1) * offset  # (C, HW)
        pts, depths, confs = _dense_unproject(
            jnp.asarray(dense_depth), jnp.asarray(self.intrinsics),
            jnp.asarray(self.cam2w), jnp.asarray(conf), h, w,
            bool(clean_depth))
        pts = np.asarray(pts)
        depths = np.asarray(depths)
        confs = np.asarray(confs)
        return ([pts[i] for i in range(c)], [depths[i] for i in range(c)],
                [confs[i] for i in range(c)])


import functools


@functools.partial(jax.jit, static_argnames=("h", "w", "clean"))
def _dense_unproject(dense_depth, K, cam2w, conf, h: int, w: int,
                     clean: bool):
    """Unproject dense depth to world points; optionally clean confidence by
    cross-view z-buffer consistency (SURVEY §2b SparseGA row: "cleaning =
    cross-view z-buffer consistency test in jnp")."""
    c = dense_depth.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (HW, 2)
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    x = (pix[None, :, 0] - cx) / fx * dense_depth
    y = (pix[None, :, 1] - cy) / fy * dense_depth
    cam_pts = jnp.stack([x, y, dense_depth], -1)           # (C, HW, 3)
    R = cam2w[:, :3, :3]
    t = cam2w[:, :3, 3]
    world = jnp.einsum("cij,cnj->cni", R, cam_pts) + t[:, None, :]

    if not clean or c == 1:
        return world, dense_depth, conf

    # cross-view consistency: a point that lands in front of what another
    # camera actually sees (by a margin) is floating noise -> conf := 1
    from .utils.se3 import se3_inverse
    w2c = se3_inverse(cam2w)

    def check_pair(pts_i, depth_j, K_j, w2c_j):
        """pts_i: (HW, 3) world points of cam i; depth map of cam j."""
        Rj = w2c_j[:3, :3]
        tj = w2c_j[:3, 3]
        p = pts_i @ Rj.T + tj
        z = p[:, 2]
        u = K_j[0, 0] * p[:, 0] / jnp.maximum(z, 1e-6) + K_j[0, 2]
        v = K_j[1, 1] * p[:, 1] / jnp.maximum(z, 1e-6) + K_j[1, 2]
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 1e-6)
        seen = depth_j.reshape(h, w)[vi, ui]
        bad = inside & (z < seen * 0.95)
        return bad

    depth_maps = dense_depth                                  # (C, HW)

    def badness_for_cam(i):
        pts_i = world[i]
        bad_votes = jax.vmap(
            lambda j: check_pair(pts_i, depth_maps[j], K[j], w2c[j])
        )(jnp.arange(c))                                      # (C, HW)
        # ignore self-vote
        mask = (jnp.arange(c) != i)[:, None]
        return jnp.sum(bad_votes & mask, axis=0) >= 1

    bad = jax.vmap(badness_for_cam)(jnp.arange(c))            # (C, HW)
    conf_clean = jnp.where(bad, 1.0, conf)
    return world, dense_depth, conf_clean


def reconstruct_scene(
    model: Mast3rModel,
    imgs: Sequence[np.ndarray],
    filelist: Optional[Sequence[str]] = None,
    device=None,
    optim_params: Optional[GAParams] = None,
    tmpdir: Optional[str] = None,
    config: Optional[Config] = None,
    pair_graph: str = "complete",
    window: int = 3,
    freeze: Optional[np.ndarray] = None,
    logger: Optional[MetricsLogger] = None,
    mesh=None,
) -> Tuple[Reconstruction, GAParams]:
    """Run the full reconstruction pipeline.

    ``filelist``/``device`` exist for reference API compatibility
    (reference reconstruct.py:19-27 requires them; we need neither — the
    cache is content-addressed and JAX owns device placement).
    """
    cfg = config or default_config()
    timer = Timer()
    n = len(imgs)
    assert n >= 2, "need at least two images"
    imgs = [np.asarray(im, np.float32) for im in imgs]
    h, w = imgs[0].shape[-2:]

    if pair_graph == "complete":
        pairs = make_pair_indices(n, symmetric=True)
    elif pair_graph == "sliding":
        pairs = make_sliding_window_pairs(n, window=window, symmetric=True)
    else:
        raise ValueError(pair_graph)

    cache = PairCache(tmpdir or cfg.scene.cache_dir)
    model_tag = _model_tag(model)

    # ---- pairwise inference (cached; pair-parallel over the mesh) --------
    with timer("inference"), trace_if("inference"):
        sharding = None
        batch = 8
        if mesh is not None:
            from .parallel import pair_sharding
            sharding = pair_sharding(mesh)
            n_dev = int(np.prod(list(mesh.shape.values())))
            batch = max(8, n_dev)
            batch -= batch % n_dev
        preds = _cached_inference(model, imgs, pairs, cache, model_tag,
                                  sharding=sharding, batch_size=batch)

    # ---- matching on the subsample grid -----------------------------------
    with timer("matching"):
        matches: Dict[Tuple[int, int], PairMatches] = {}
        refined = {} if cfg.matching.anchor_refine else None
        for p in preds:
            d1 = jnp.asarray(p.desc1)
            d2 = jnp.asarray(p.desc2)
            m = match_pair(d1, d2,
                           jnp.asarray(p.conf1), jnp.asarray(p.conf2),
                           subsample=cfg.matching.subsample)
            matches[(p.idx1, p.idx2)] = jax.tree_util.tree_map(np.asarray, m)
            if refined is not None:
                # pixel-accurate endpoints (reference fast_reciprocal_NNs
                # accuracy) anchored to core cells in `condense`
                pix1, pix2 = refine_matches(d1, d2, m,
                                            subsample=cfg.matching.subsample)
                refined[(p.idx1, p.idx2)] = (np.asarray(pix1),
                                             np.asarray(pix2))

    # ---- canonical views + MST -------------------------------------------
    with timer("canonical"):
        views, preds_21 = build_canonical_views(
            n, preds, subsample=cfg.matching.subsample,
            mode=cfg.matching.canonical_mode)
        scores = np.zeros((n, n))
        for (i, j), m in matches.items():
            scores[i, j] = float(np.sum(m.conf * m.mask))
        mst = max_spanning_tree(scores)

    # ---- condense + GA ----------------------------------------------------
    with timer("condense"):
        data = condense(views, matches, preds_21, (h, w),
                        cfg.matching.subsample, cfg.ga.matching_conf_thr,
                        max_corres_per_pair=cfg.matching.max_corres_per_pair,
                        refined=refined)
    depth_basis = depth_coeffs = None
    if cfg.ga.lora_depth:
        if not cfg.ga.opt_depth:
            import warnings
            warnings.warn(
                "lora_depth without opt_depth freezes the spectral "
                "coefficients: depth is only replaced by its lossy rank-k "
                "approximation. Set GAConfig.opt_depth=True (the CLI "
                "--lora-depth flag implies it).", stacklevel=2)
        # spectral low-rank depth (reference reconstruct.py:270-273): basis
        # from image appearance on the core grid, initial coefficients by
        # least squares against the canonical core depth
        from .alignment.spectral import spectral_projection_of_depthmaps
        from .ops.matching import subsample_grid_indices
        with timer("lora_basis"):
            grid, hs, ws = subsample_grid_indices(h, w,
                                                  cfg.matching.subsample)
            grid = np.asarray(grid)
            core_colors = np.stack([
                im.reshape(3, h * w).T[grid] for im in imgs])   # (C, S, 3)
            depth_coeffs, depth_basis = spectral_projection_of_depthmaps(
                core_colors, np.asarray(data.core_depth), (hs, ws),
                k=cfg.ga.lora_k, gamma=cfg.ga.lora_gamma,
                min_norm=cfg.ga.lora_min_norm)
    with timer("ga"), trace_if("ga"):
        result, params = run_global_alignment(
            data, mst, cfg.ga, prev_params=optim_params, freeze=freeze,
            depth_basis=depth_basis, depth_coeffs=depth_coeffs)

    cam2w_out = np.asarray(result.cam2w)
    K_out = np.asarray(result.K)
    if cfg.ga.refine_lm:
        # post-GA LM/Gauss-Newton polish over ABSOLUTE poses: the GA's
        # chained parameterization is great for initialization but couples
        # every camera to its MST ancestors; LM re-solves the decoupled
        # problem around the GA optimum (alignment/lm.py docstring)
        with timer("lm_refine"), trace_if("lm_refine"):
            conf = (np.asarray(data.corr_conf)
                    * np.asarray(data.pair_matching_ok)[
                        np.asarray(data.corr_pair)])
            if freeze is not None:
                both = (np.asarray(freeze)[data.corr_img1]
                        & np.asarray(freeze)[data.corr_img2])
                conf = conf * (~both)
            if cfg.ga.lm_mode == "schur":
                from .alignment.schur import build_tracks, schur_refine
                tracks = build_tracks(
                    np.asarray(data.corr_img1), np.asarray(data.corr_idx1),
                    np.asarray(data.corr_img2), np.asarray(data.corr_idx2),
                    conf.astype(np.float32), n,
                    np.asarray(data.core_pix).shape[0],
                    max_obs=cfg.ga.lm_max_obs)
                cam2w_out, focals_r, lm_costs = schur_refine(
                    cam2w_out, K_out[:, 0, 0], K_out[:, :2, 2],
                    np.asarray(result.depth), np.asarray(data.core_pix),
                    tracks, iters=cfg.ga.lm_iters,
                    damping=cfg.ga.lm_damping, mesh=mesh)
            else:
                from .alignment.lm import lm_refine
                cam2w_out, focals_r, lm_costs = lm_refine(
                    cam2w_out, K_out[:, 0, 0], K_out[:, :2, 2],
                    np.asarray(result.depth), np.asarray(data.core_pix),
                    np.asarray(data.corr_img1), np.asarray(data.corr_idx1),
                    np.asarray(data.corr_img2), np.asarray(data.corr_idx2),
                    conf.astype(np.float32), iters=cfg.ga.lm_iters,
                    damping=cfg.ga.lm_damping, mesh=mesh)
            K_out = K_out.copy()
            K_out[:, 0, 0] = focals_r
            K_out[:, 1, 1] = focals_r
            if logger is not None and lm_costs:
                logger.log("lm_refine", cost_first=lm_costs[0],
                           cost_last=lm_costs[-1], iters=len(lm_costs))

    if logger is not None:
        logger.log("reconstruct", n_images=n, n_pairs=len(pairs),
                   loss_coarse=result.loss_coarse,
                   loss_fine=result.loss_fine, **timer.summary())

    display = [np.clip(im.transpose(1, 2, 0) * 0.5 + 0.5, 0, 1)
               for im in imgs]
    rec = Reconstruction(
        imgs=display,
        cam2w=cam2w_out,
        intrinsics=K_out,
        core_depth=np.asarray(result.depth),
        views=views,
        subsample=cfg.matching.subsample,
        ga_params=params,
        losses=(result.loss_coarse, result.loss_fine),
    )
    return rec, params


def _model_tag(model: Mast3rModel) -> str:
    """Deterministic digest of EVERY parameter leaf.

    A per-leaf (sum, l2, min, max) fingerprint is reduced on device (tiny
    host transfer even for ViT-large) and hashed together with each leaf's
    path/shape/dtype: any changed leaf — e.g. a fine-tune sharing a frozen
    patch embed with another checkpoint — changes the tag, so the pair
    cache cannot serve stale predictions across checkpoints."""
    tag = getattr(model, "_tag", None)
    if tag is None:
        paths = jax.tree_util.tree_flatten_with_path(model.params)[0]
        if paths:
            @jax.jit
            def _fp(params):
                leaves = jax.tree_util.tree_leaves(params)
                return jnp.stack([
                    jnp.stack([x.sum(), (x.astype(jnp.float32) ** 2).sum(),
                               x.min(), x.max()])
                    for x in (l.astype(jnp.float32) for l in leaves)])
            fp = np.asarray(jax.device_get(_fp(model.params)), np.float64)
            meta = [(jax.tree_util.keystr(k), v.shape, str(v.dtype))
                    for k, v in paths]
            tag = content_key(model.cfg, str(meta), fp)
        else:
            tag = content_key(model.cfg, 0, np.zeros(1))
        model._tag = tag
    return tag


def _cached_inference(model: Mast3rModel, imgs, pairs, cache: PairCache,
                      model_tag: str, sharding=None,
                      batch_size: int = 8) -> List[PairPrediction]:
    img_keys = [content_key(np.asarray(im, np.float32)) for im in imgs]
    preds: List[Optional[PairPrediction]] = [None] * len(pairs)
    missing = []
    for k, (i, j) in enumerate(pairs):
        key = content_key(model_tag, img_keys[i], img_keys[j])
        hit = cache.get(key) if cache.dir else None
        if hit is not None:
            preds[k] = PairPrediction(idx1=i, idx2=j, **{
                f: hit[f] for f in ("pts1", "conf1", "pts2", "conf2",
                                    "desc1", "desc2", "desc_conf1",
                                    "desc_conf2")})
        else:
            missing.append((k, (i, j), key))
    if missing:
        fresh = model.infer_pairs(imgs, [p for _, p, _ in missing],
                                  batch_size=batch_size, sharding=sharding)
        for (k, _, key), pred in zip(missing, fresh):
            preds[k] = pred
            if cache.dir:
                cache.put(key, {f: getattr(pred, f) for f in
                                ("pts1", "conf1", "pts2", "conf2", "desc1",
                                 "desc2", "desc_conf1", "desc_conf2")})
    return preds  # type: ignore[return-value]
