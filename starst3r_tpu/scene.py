"""Stateful Scene facade — the reference's main user-facing class
(reference: starster/scene.py:18-183). Holds the incremental reconstruction
(images, poses, intrinsics, dense points) and the 3DGS training state, with
the same method surface: `add_images`, `init_3dgs`, `render_3dgs`,
`render_3dgs_original`, `run_3dgs_optim`, `dense_pts_flat`, `dense_cols_flat`,
`w2c`, plus checkpoint save/restore.

Incremental semantics (reference scene.py:97-155): `add_images` re-runs
reconstruction over ALL images, warm-starting the GA from the previous
`optim_params` (the SLAM mechanism), then replaces poses/points wholesale.
The reference re-infers all O(N²) pairs each call, softened by the disk
cache (SURVEY §2a quirk 6) — our content-addressed cache gives the same
skip-completed-pairs behavior without fake filenames (SURVEY §7.5).
"""

from __future__ import annotations

import tempfile
from typing import Any, List, Optional

import numpy as np

from .config import Config, default_config
from .models.mast3r import Mast3rModel
from .reconstruct import Reconstruction, reconstruct_scene
from .utils.metrics import MetricsLogger

__all__ = ("Scene",)


class Scene:
    """TPU-native Starst3r scene."""

    def __init__(self, cache_dir: Optional[str] = None, device: str = "tpu",
                 config: Optional[Config] = None,
                 logger: Optional[MetricsLogger] = None):
        """``device`` is accepted for reference API compatibility
        (reference scene.py:47-56); JAX owns placement."""
        self.device = device
        self.config = config or default_config()
        self.cache_dir = cache_dir or tempfile.mkdtemp(prefix="starst3r_")
        self.logger = logger

        self.raw_imgs: List[np.ndarray] = []   # processed (3, H, W) [-1, 1]
        self.imgs: List[np.ndarray] = []       # display (H, W, 3) [0, 1]

        self.dense_pts: List[np.ndarray] = []
        self.dense_cols: List[np.ndarray] = []
        # per-point local spacing depth/focal (full-res grid) — optional
        # adaptive 3DGS init scales (splat.init_3dgs adaptive_scales)
        self.dense_scales: List[np.ndarray] = []
        self.c2w: Optional[np.ndarray] = None
        self.intrinsics: Optional[np.ndarray] = None

        self.optim_params: Optional[Any] = None
        self.reconstruction: Optional[Reconstruction] = None
        self.gs_state: Optional[Any] = None

    # ------------------------------------------------------------------
    @property
    def dense_pts_flat(self) -> np.ndarray:
        """Dense points concatenated from all cameras
        (reference scene.py:79-84)."""
        assert self.dense_pts, "No dense points available."
        return np.concatenate(self.dense_pts, axis=0)

    @property
    def dense_cols_flat(self) -> np.ndarray:
        assert self.dense_cols, "No dense colors available."
        return np.concatenate(self.dense_cols, axis=0)

    @property
    def w2c(self) -> np.ndarray:
        """World-to-camera matrices (reference scene.py:92-95)."""
        assert self.c2w is not None, "No c2w matrix available."
        import jax.numpy as jnp
        from .utils.se3 import se3_inverse
        return np.asarray(se3_inverse(jnp.asarray(self.c2w)))

    # ------------------------------------------------------------------
    def add_images(self, model: Mast3rModel, imgs: List[np.ndarray],
                   conf_thres: float = 1.5, pair_graph: str = "complete"):
        """Add GT images, solve poses + dense points
        (reference scene.py:97-155).

        imgs: processed images (3, H, W) in [-1, 1] from `load_image`.
        """
        self.raw_imgs.extend([np.asarray(im, np.float32) for im in imgs])

        rec, optim_params = reconstruct_scene(
            model, self.raw_imgs,
            optim_params=self.optim_params,
            tmpdir=self.cache_dir,
            config=self.config,
            pair_graph=pair_graph,
            logger=self.logger,
        )
        self.optim_params = optim_params
        self.reconstruction = rec

        curr = len(self.imgs)
        self.imgs.extend(rec.imgs[curr:])

        # wholesale replace, like the reference (scene.py:135-146 TODO notes
        # the missing coordinate-shift handling for incremental merges —
        # warm-start keeps frames aligned in practice)
        self.c2w = rec.cam2w
        self.intrinsics = rec.intrinsics

        pts, depths, confs = rec.get_dense_pts3d(clean_depth=True)
        self.dense_pts = []
        self.dense_cols = []
        self.dense_scales = []
        for i in range(len(rec.imgs)):
            mask = np.asarray(confs[i]).reshape(-1) > conf_thres
            colors = rec.imgs[i].reshape(-1, 3)
            self.dense_pts.append(np.asarray(pts[i])[mask])
            self.dense_cols.append(colors[mask])
            # local point spacing of the full-res grid: depth / focal
            self.dense_scales.append(
                np.asarray(depths[i]).reshape(-1)[mask]
                / float(self.intrinsics[i, 0, 0]))

    # ------------------------------------------------------------------
    def register_camera(self, model, img, conf_thres: float = 1.5,
                        pair_graph: str = "complete"):
        """Register ONE new image against the existing reconstruction
        WITHOUT moving it: all previous cameras (poses, intrinsics, depth)
        are frozen and only the new camera's parameters optimize.

        This is the held-out/novel-camera localization primitive (e.g.
        evaluate novel-view PSNR at a camera whose image never entered
        training): `add_images` re-optimizes every camera jointly (the
        reference's warm-start semantics, starster/scene.py:97-155 +
        reconstruct.py:408-415), which shifts the whole gauge; freezing
        keeps the existing frame fixed so Gaussians trained in it stay
        valid. Returns the new camera's c2w (4, 4).
        """
        n_prev = len(self.raw_imgs)
        assert n_prev >= 2, "register_camera needs an existing scene"
        self.raw_imgs.append(np.asarray(img, np.float32))
        freeze = np.zeros(n_prev + 1, bool)
        freeze[:n_prev] = True
        rec, optim_params = reconstruct_scene(
            model, self.raw_imgs,
            optim_params=self.optim_params,
            tmpdir=self.cache_dir,
            config=self.config,
            pair_graph=pair_graph,
            freeze=freeze,
            logger=self.logger,
        )
        self.optim_params = optim_params
        self.reconstruction = rec
        curr = len(self.imgs)
        self.imgs.extend(rec.imgs[curr:])
        self.c2w = rec.cam2w
        self.intrinsics = rec.intrinsics
        pts, depths, confs = rec.get_dense_pts3d(clean_depth=True)
        self.dense_pts = []
        self.dense_cols = []
        self.dense_scales = []
        for i in range(len(rec.imgs)):
            mask = np.asarray(confs[i]).reshape(-1) > conf_thres
            colors = rec.imgs[i].reshape(-1, 3)
            self.dense_pts.append(np.asarray(pts[i])[mask])
            self.dense_cols.append(colors[mask])
            # local point spacing of the full-res grid: depth / focal
            self.dense_scales.append(
                np.asarray(depths[i]).reshape(-1)[mask]
                / float(self.intrinsics[i, 0, 0]))
        return np.asarray(self.c2w[-1])

    # ------------------------------------------------------------------
    def init_3dgs(self, init_scale: float = 3e-3, lr: float = 1e-3,
                  pool_size: int = -1, adaptive_scales: bool = False):
        """pool_size -1 (default) reserves min(cap_max, pool_headroom * N)
        inactive slots so MCMC growth is active (see splat.init_3dgs).
        adaptive_scales seeds each splat at its local point spacing
        (recommended quality recipe, docs/gaussian_splatting.md)."""
        from .splat import init_3dgs
        return init_3dgs(self, init_scale, lr, pool_size=pool_size,
                         adaptive_scales=adaptive_scales)

    def render_3dgs(self, w2c, intrinsics, width: int, height: int):
        from .splat import render_3dgs
        return render_3dgs(self, w2c, intrinsics, width, height)

    def render_3dgs_original(self, width: int, height: int):
        from .splat import render_3dgs_original
        return render_3dgs_original(self, width, height)

    def run_3dgs_optim(self, iters: int, enable_pruning: bool = False,
                       loss_ssim_fac: float = 0.2,
                       loss_opacity_fac: float = 0.01,
                       loss_scale_fac: float = 0.01,
                       verbose: bool = False) -> List[float]:
        from .splat import run_3dgs_optim
        return run_3dgs_optim(self, iters, enable_pruning, loss_ssim_fac,
                              loss_opacity_fac, loss_scale_fac, verbose)

    # ------------------------------------------------------------------
    def save(self, path: str):
        """Checkpoint scene state (poses, intrinsics, GA warm-start params,
        Gaussians) — SURVEY §5 checkpoint row."""
        from .utils.checkpoint import save_pytree
        state = {
            "c2w": self.c2w, "intrinsics": self.intrinsics,
            # store the PROCESSED images exactly (float32): a save/load/
            # train-gs round trip must optimize against bit-identical GT and
            # re-derive identical pair-cache content keys (no re-quantization)
            "raw_imgs": (np.stack(self.raw_imgs).astype(np.float32)
                         if self.raw_imgs else np.zeros((0,), np.float32)),
            "imgs": (np.stack(self.imgs).astype(np.float32)
                     if self.imgs else np.zeros((0,), np.float32)),
            "optim_params": (tuple(self.optim_params)
                             if self.optim_params is not None else ()),
            "gaussians": (dict(self.gs_state.params)
                          if self.gs_state is not None else {}),
            "gs_n_alive": (np.asarray(self.gs_state.n_alive)
                           if self.gs_state is not None
                           else np.asarray(0, np.int32)),
        }
        save_pytree(path, state)

    @classmethod
    def load(cls, path: str, cache_dir: Optional[str] = None,
             config: Optional[Config] = None) -> "Scene":
        """Restore a scene saved by :meth:`save` — poses, intrinsics, GT
        images, GA warm-start params, and (if present) Gaussian state with a
        fresh optimizer."""
        from .alignment.ga import GAParams
        from .utils.checkpoint import group_flat, load_flat

        flat = load_flat(path)
        scene = cls(cache_dir=cache_dir, config=config)
        scene.c2w = np.asarray(flat["c2w"])
        scene.intrinsics = np.asarray(flat["intrinsics"])
        imgs = np.asarray(flat.get("imgs", np.zeros((0,))), np.float32)
        if imgs.ndim == 4:
            scene.imgs = [imgs[i] for i in range(imgs.shape[0])]
        raw = np.asarray(flat.get("raw_imgs", np.zeros((0,))), np.float32)
        if raw.ndim == 4:
            # exact processed (3,H,W) [-1,1] arrays: add_images continues
            # with bit-identical inputs (stable cache keys)
            scene.raw_imgs = [raw[i] for i in range(raw.shape[0])]
        elif imgs.ndim == 4:
            # legacy checkpoints without raw_imgs: rebuild (approximate)
            scene.raw_imgs = [im.transpose(2, 0, 1) * 2.0 - 1.0
                              for im in scene.imgs]
        op = group_flat(flat, "optim_params")
        if op:
            scene.optim_params = GAParams(
                *[op[str(i)] for i in range(len(GAParams._fields))])
        gauss = group_flat(flat, "gaussians")
        if gauss:
            import jax
            import jax.numpy as jnp
            import optax

            from .splat.train import GSState
            params = {k: jnp.asarray(v) for k, v in gauss.items()}
            opt = optax.adam(scene.config.splat.lr)
            n_alive = flat.get("gs_n_alive", None)
            if n_alive is None or int(n_alive) <= 0:
                n_alive = params["means"].shape[0]
            scene.gs_state = GSState(
                params=params, opt_state=opt.init(params),
                step=jnp.asarray(0), key=jax.random.PRNGKey(0),
                n_alive=jnp.asarray(int(n_alive), jnp.int32))
        return scene
