"""Diagnose the e2e holdout-PSNR gap (VERDICT r4 weak #1 / next #1).

Replicates bench.py's e2e_quality stage, additionally recording:
  - train-view PSNR (does the splat fit the TRAIN views at all?)
  - GT-pose variant of the same splat training (isolates pose error)
  - GA pose quality of this exact scene (ATE fraction)
  - variants: more iters, MCMC on

Usage:  python tools/probe_e2e.py [--iters 300] [--variant base|gt|mcmc|long]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--variants", default="base,gt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from starst3r_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.config import GAConfig, SplatConfig
    from starst3r_tpu.ops.ssim import psnr as psnr_fn
    from starst3r_tpu.splat.train import init_gaussians, render, run_optim
    from starst3r_tpu.utils.eval import ate_rmse
    from starst3r_tpu.utils.synthetic import synthetic_image_scene

    edata, emst, egt, eK, eimgs, ehit = synthetic_image_scene(
        n_cams=6, hw=128, subsample=2)
    t0 = time.time()
    eres, _ = run_global_alignment(
        edata, emst, GAConfig(niter1=500, niter2=200, lr2=0.004,
                              jit_chunk=10))
    print(f"GA took {time.time()-t0:.1f}s")
    pred = np.asarray(eres.cam2w)
    traj = float(np.linalg.norm(
        egt[:, :3, 3] - egt[:, :3, 3].mean(0), axis=1).max())
    print(f"GA ATE frac of traj: {float(ate_rmse(pred, egt))/traj:.5f}")

    hold = 3
    train_cams = [i for i in range(6) if i != hold]
    core_pix = np.asarray(edata.core_pix).astype(np.int64)
    cfg = SplatConfig(rebin_every=4)

    def run_variant(name, w2c_all, K_all, pts_all, iters, pruning):
        e_pts = pts_all[train_cams].reshape(-1, 3)
        e_cols = np.stack([eimgs[i][core_pix[:, 1], core_pix[:, 0]]
                           for i in train_cams]).reshape(-1, 3)
        ecfg = dataclasses.replace(cfg, init_scale=0.045, pool_headroom=0.0)
        est = init_gaussians(e_pts, e_cols, ecfg)
        est, losses = run_optim(est, eimgs[train_cams], w2c_all[train_cams],
                                K_all[train_cams], iters, ecfg,
                                enable_pruning=pruning)
        # train PSNR
        rgb_tr = jnp.clip(render(est.params, w2c_all[train_cams],
                                 K_all[train_cams], 128, 128, ecfg,
                                 n_alive=est.n_alive)[0], 0, 1)
        tr_psnr = float(np.mean([psnr_fn(jnp.asarray(eimgs[i]), rgb_tr[k])
                                 for k, i in enumerate(train_cams)]))
        rgb_h = jnp.clip(render(est.params, w2c_all[hold:hold+1],
                                K_all[hold:hold+1], 128, 128, ecfg,
                                n_alive=est.n_alive)[0][0], 0, 1)
        h_psnr = float(psnr_fn(jnp.asarray(eimgs[hold]), rgb_h))
        print(f"[{name}] iters={iters} pruning={pruning} "
              f"train_psnr={tr_psnr:.2f} holdout_psnr={h_psnr:.2f} "
              f"final_loss={losses[-1]:.4f}")
        return est

    variants = args.variants.split(",")
    if "base" in variants:
        run_variant("recovered", np.asarray(eres.w2c), np.asarray(eres.K),
                    np.asarray(eres.pts3d), args.iters, False)
    if "gt" in variants:
        # GT poses + GT geometry (exact core points from planted depth)
        gt_w2c = np.stack([np.linalg.inv(egt[i]) for i in range(6)])
        gt_K = np.tile(eK[None], (6, 1, 1)).astype(np.float32)
        # exact core points: unproject planted depth
        from starst3r_tpu.utils.synthetic import _ray_sphere_depth
        sph_c = np.array([0.0, 0.0, 4.0])
        pts = []
        for i in range(6):
            d = _ray_sphere_depth(egt[i], eK, edata.core_pix.astype(
                np.float64), sph_c, 1.2)
            cp = edata.core_pix
            dc = np.stack([(cp[:, 0] - eK[0, 2]) / eK[0, 0] * d,
                           (cp[:, 1] - eK[1, 2]) / eK[1, 1] * d, d], -1)
            pts.append(dc @ egt[i][:3, :3].T + egt[i][:3, 3])
        run_variant("gt-pose", gt_w2c.astype(np.float32), gt_K,
                    np.stack(pts).astype(np.float32), args.iters, False)
    if "mcmc" in variants:
        run_variant("recovered-mcmc", np.asarray(eres.w2c),
                    np.asarray(eres.K), np.asarray(eres.pts3d),
                    args.iters, True)
    if "long" in variants:
        run_variant("recovered-long", np.asarray(eres.w2c),
                    np.asarray(eres.K), np.asarray(eres.pts3d),
                    args.iters * 3, False)


if __name__ == "__main__":
    main()
