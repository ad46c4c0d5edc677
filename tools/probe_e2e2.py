"""e2e diagnosis part 2: which splat config fits the TRAIN views of the
synthetic image scene? Sweeps compat flags / iters / init scale, prints
param stats after training."""

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
from starst3r_tpu.utils.synthetic import synthetic_image_scene

edata, emst, egt, eK, eimgs, ehit = synthetic_image_scene(n_cams=6, hw=128,
                                                    subsample=2)
hold = 3
train_cams = [i for i in range(6) if i != hold]
core_pix = np.asarray(edata.core_pix).astype(np.int64)

# use GT poses directly (pose error already known tiny) to iterate fast
gt_w2c = np.stack([np.linalg.inv(egt[i]) for i in range(6)]).astype(
    np.float32)
gt_K = np.tile(eK[None], (6, 1, 1)).astype(np.float32)
from starst3r_tpu.utils.synthetic import _ray_sphere_depth
sph_c = np.array([0.0, 0.0, 4.0])
pts = []
for i in range(6):
    d = _ray_sphere_depth(egt[i], eK, edata.core_pix.astype(np.float64),
                          sph_c, 2.0)
    cp = edata.core_pix
    dc = np.stack([(cp[:, 0] - eK[0, 2]) / eK[0, 0] * d,
                   (cp[:, 1] - eK[1, 2]) / eK[1, 1] * d, d], -1)
    pts.append(dc @ egt[i][:3, :3].T + egt[i][:3, 3])
pts = np.stack(pts).astype(np.float32)


def run(name, iters=300, pruning=False, **kw):
    kw.setdefault("pool_headroom", 0.0)
    cfg = SplatConfig(rebin_every=4, **kw)
    e_pts = pts[train_cams].reshape(-1, 3)
    e_cols = np.stack([eimgs[i][core_pix[:, 1], core_pix[:, 0]]
                       for i in train_cams]).reshape(-1, 3)
    est = init_gaussians(e_pts, e_cols, cfg)
    rgb0 = jnp.clip(render(est.params, gt_w2c[train_cams],
                           gt_K[train_cams], 128, 128, cfg,
                           n_alive=est.n_alive)[0], 0, 1)
    p0 = float(np.mean([psnr_fn(jnp.asarray(eimgs[i]), rgb0[k])
                        for k, i in enumerate(train_cams)]))
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
    sc = np.asarray(est.params["scales"])
    op = np.asarray(est.params["opacities"])
    print(f"[{name}] init_psnr={p0:.2f} train={tr:.2f} hold={hp:.2f} "
          f"loss={losses[-1]:.3f} scales[{sc.min():.3f},{sc.mean():.3f},"
          f"{sc.max():.3f}] op[{op.min():.2f},{op.mean():.2f},"
          f"{op.max():.2f}] alive={int(est.n_alive)}")


run("base-compat", init_scale=0.045)
run("no-inverted-sh", init_scale=0.045, compat_inverted_sh=False)
run("no-raw-act", init_scale=0.045, compat_raw_activations=False)
run("both-off", init_scale=0.045, compat_inverted_sh=False,
    compat_raw_activations=False)
run("both-off-1000", iters=1000, init_scale=0.045,
    compat_inverted_sh=False, compat_raw_activations=False)
run("both-off-mcmc", iters=1000, pruning=True, init_scale=0.045,
    compat_inverted_sh=False, compat_raw_activations=False,
    mcmc_refine_start=200, mcmc_refine_stop=800, pool_headroom=2.0)
