"""Render train/holdout views after e2e splat training and save PNGs for
visual inspection of the failure mode."""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from PIL import Image

from starst3r_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from starst3r_tpu.config import SplatConfig
from starst3r_tpu.ops.ssim import psnr as psnr_fn
from starst3r_tpu.splat.train import init_gaussians, render, run_optim
from starst3r_tpu.utils.synthetic import _ray_sphere_depth, \
    synthetic_image_scene

edata, emst, egt, eK, eimgs, ehit = synthetic_image_scene(n_cams=6, hw=128,
                                                    subsample=2)
hold = 3
train_cams = [i for i in range(6) if i != hold]
core_pix = np.asarray(edata.core_pix).astype(np.int64)
gt_w2c = np.stack([np.linalg.inv(egt[i]) for i in range(6)]).astype(
    np.float32)
gt_K = np.tile(eK[None], (6, 1, 1)).astype(np.float32)
sph_c = np.array([0.0, 0.0, 4.0])
pts = []
for i in range(6):
    d = _ray_sphere_depth(egt[i], eK, edata.core_pix.astype(np.float64),
                          sph_c, 1.2)
    cp = edata.core_pix
    dc = np.stack([(cp[:, 0] - eK[0, 2]) / eK[0, 0] * d,
                   (cp[:, 1] - eK[1, 2]) / eK[1, 1] * d, d], -1)
    pts.append(dc @ egt[i][:3, :3].T + egt[i][:3, 3])
pts = np.stack(pts).astype(np.float32)

cfg = SplatConfig(rebin_every=4, pool_headroom=0.0, init_scale=0.045,
                  compat_inverted_sh=False, compat_raw_activations=False)
mask = ehit[train_cams].reshape(-1)
e_pts = pts[train_cams].reshape(-1, 3)[mask]
e_cols = np.stack([eimgs[i][core_pix[:, 1], core_pix[:, 0]]
                   for i in train_cams]).reshape(-1, 3)[mask]
est = init_gaussians(e_pts, e_cols, cfg)
r0 = jnp.clip(render(est.params, gt_w2c, gt_K, 128, 128, cfg,
                     n_alive=est.n_alive)[0], 0, 1)
est, losses = run_optim(est, eimgs[train_cams], gt_w2c[train_cams],
                        gt_K[train_cams], 600, cfg)
r1 = jnp.clip(render(est.params, gt_w2c, gt_K, 128, 128, cfg,
                     n_alive=est.n_alive)[0], 0, 1)
rows = []
for i in range(6):
    rows.append(np.concatenate([eimgs[i], np.asarray(r0[i]),
                                np.asarray(r1[i])], axis=1))
    print(f"cam{i} {'HOLD' if i == hold else 'train'} "
          f"init={float(psnr_fn(jnp.asarray(eimgs[i]), r0[i])):.2f} "
          f"final={float(psnr_fn(jnp.asarray(eimgs[i]), r1[i])):.2f}")
img = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
Image.fromarray(img).save("/tmp/e2e_vis.png")
print("saved /tmp/e2e_vis.png  (cols: GT | init | trained)")
