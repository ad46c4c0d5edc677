"""e2e diagnosis part 3: per-point init scales + per-param lrs.

GT poses (isolate the splat fit); prints train/holdout PSNR per config.
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from starst3r_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from starst3r_tpu.config import SplatConfig
from starst3r_tpu.ops.ssim import psnr as psnr_fn
from starst3r_tpu.splat.train import init_gaussians, render, run_optim
from starst3r_tpu.utils.synthetic import _ray_sphere_depth, \
    synthetic_image_scene

SUB = 2
FOCAL = 180.0
edata, emst, egt, eK, eimgs, ehit = synthetic_image_scene(
    n_cams=6, hw=128, subsample=SUB)
hold = 3
train_cams = [i for i in range(6) if i != hold]
cp = np.asarray(edata.core_pix).astype(np.int64)
gt_w2c = np.stack([np.linalg.inv(egt[i]) for i in range(6)]).astype(
    np.float32)
gt_K = np.tile(eK[None], (6, 1, 1)).astype(np.float32)
sph_c = np.array([0.0, 0.0, 4.0])
pts, depths = [], []
for i in range(6):
    d = _ray_sphere_depth(egt[i], eK, edata.core_pix.astype(np.float64),
                          sph_c, 1.2)
    c2 = edata.core_pix
    dc = np.stack([(c2[:, 0] - eK[0, 2]) / eK[0, 0] * d,
                   (c2[:, 1] - eK[1, 2]) / eK[1, 1] * d, d], -1)
    pts.append(dc @ egt[i][:3, :3].T + egt[i][:3, 3])
    depths.append(d)
pts = np.stack(pts).astype(np.float32)
depths = np.stack(depths).astype(np.float32)
mask = ehit[train_cams].reshape(-1)
e_pts = pts[train_cams].reshape(-1, 3)[mask]
e_cols = np.stack([eimgs[i][cp[:, 1], cp[:, 0]]
                   for i in train_cams]).reshape(-1, 3)[mask]
e_scales = (depths[train_cams].reshape(-1)[mask] * SUB / FOCAL)
print("n gaussians:", e_pts.shape[0], "scale range",
      e_scales.min(), e_scales.max())


def run(name, iters=600, pruning=False, per_point=True, **kw):
    cfg = SplatConfig(rebin_every=4, pool_headroom=0.0,
                      init_scale=0.045, compat_inverted_sh=False,
                      compat_raw_activations=False, **kw)
    est = init_gaussians(e_pts, e_cols, cfg,
                         point_scales=e_scales if per_point else None)
    est, losses = run_optim(est, eimgs[train_cams], gt_w2c[train_cams],
                            gt_K[train_cams], iters, cfg,
                            enable_pruning=pruning)
    rgb_tr = jnp.clip(render(est.params, gt_w2c[train_cams],
                             gt_K[train_cams], 128, 128, cfg,
                             n_alive=est.n_alive)[0], 0, 1)
    tr = float(np.mean([psnr_fn(jnp.asarray(eimgs[i]), rgb_tr[k])
                        for k, i in enumerate(train_cams)]))
    rgb_h = jnp.clip(render(est.params, gt_w2c[hold:hold+1],
                            gt_K[hold:hold+1], 128, 128, cfg,
                            n_alive=est.n_alive)[0][0], 0, 1)
    hp = float(psnr_fn(jnp.asarray(eimgs[hold]), rgb_h))
    print(f"[{name}] train={tr:.2f} hold={hp:.2f} loss={losses[-1]:.3f} "
          f"alive={int(est.n_alive)}")


LRS = dict(lr_means=5e-4, lr_quats=1e-3, lr_scales=5e-3,
           lr_opacities=5e-2, lr_sh=2.5e-3)
run("pp-scale-only")
run("pp+lrs", **LRS)
run("pp+lrs-1500", iters=1500, **LRS)
run("uniform+lrs", per_point=False, **LRS)
