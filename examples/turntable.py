"""Render a novel-view TURNTABLE GIF from a full reconstruct->splat run —
the user-visible artifact analog of the reference's demo.gif
(reference README.md:5; docs/images/demo.gif).

Pipeline (all our own components, no checkpoint needed): synthetic
textured-sphere scene with exact correspondences -> sparse global
alignment recovers the camera trajectory -> 3DGS trains on the RECOVERED
poses (product seeding recipe: confidence-masked cells, per-point scales,
per-param lrs) -> SE(3)-interpolated orbit path (utils.se3.interp_se3_path,
the reference's camera-path utility, starster/utils.py:57-78) -> frames ->
animated GIF.

Usage:
    python examples/turntable.py --out /tmp/turntable.gif [--iters 600]
    python examples/turntable.py --quick        # tiny/CPU-friendly run

Real-image scenes: run the same path via the CLI instead —
`starst3r reconstruct --imgdir ... --save scene.ckpt`,
`starst3r train-gs --scene scene.ckpt ...`, then
`starst3r render-path --scene scene.ckpt --out frames/` and assemble the
frames (docs/quickstart).
"""

import argparse
import dataclasses
import os
import sys
import time

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/turntable.gif")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="64px / 150 iters / 16 frames (CPU-friendly)")
    args = ap.parse_args()
    if args.quick:
        args.hw, args.iters, args.frames = 64, 150, 16

    import jax.numpy as jnp

    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.config import GAConfig, SplatConfig
    from starst3r_tpu.splat.train import init_gaussians, render, run_optim
    from starst3r_tpu.utils import enable_compilation_cache
    from starst3r_tpu.utils.se3 import interp_se3_path, se3_inverse
    from starst3r_tpu.utils.synthetic import synthetic_image_scene
    from PIL import Image

    enable_compilation_cache()
    sub = 2 if args.hw >= 128 else 4
    t0 = time.time()
    data, mst, _gt, _K, imgs, hit = synthetic_image_scene(
        n_cams=8, hw=args.hw, subsample=sub, spread=0.25,
        focal=180.0 * args.hw / 128)
    res, _ = run_global_alignment(
        data, mst, GAConfig(niter1=500, niter2=200, lr2=0.004,
                            jit_chunk=10))
    print(f"[turntable] GA recovered 8 poses in {time.time()-t0:.1f}s")

    cp = np.asarray(data.core_pix).astype(np.int64)
    m = hit.reshape(-1)
    pts = np.asarray(res.pts3d).reshape(-1, 3)[m]
    cols = np.stack([imgs[i][cp[:, 1], cp[:, 0]]
                     for i in range(8)]).reshape(-1, 3)[m]
    scales = (np.asarray(res.depth).reshape(-1)[m] * sub
              / np.asarray(res.K)[:, 0, 0].repeat(cp.shape[0])[m])
    cfg = SplatConfig(
        rebin_every=4, compat_inverted_sh=False,
        compat_raw_activations=False, lr_means=3e-5, lr_quats=1e-3,
        lr_scales=5e-3, lr_opacities=5e-2, lr_sh=2.5e-3,
        loss_anchor_fac=0.3, mcmc_refine_start=300, mcmc_refine_stop=550)
    state = init_gaussians(pts, cols, cfg, point_scales=scales,
                           pool_size=int(2.0 * pts.shape[0]))
    t1 = time.time()
    state, losses = run_optim(state, imgs, np.asarray(res.w2c),
                              np.asarray(res.K), args.iters, cfg,
                              enable_pruning=True)
    print(f"[turntable] 3DGS {args.iters} iters in {time.time()-t1:.1f}s; "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    # orbit: ping-pong through the recovered key poses and back, so the
    # GIF loops smoothly
    c2w = np.asarray(res.cam2w)
    keys = np.concatenate([c2w, c2w[-2::-1]], axis=0)
    nseg = len(keys) - 1
    per_seg = max(2, args.frames // nseg + 1)
    mats = []
    for a, b in zip(keys[:-1], keys[1:]):
        seg = np.asarray(interp_se3_path(a, b, steps=per_seg))
        mats.append(seg if not mats else seg[1:])
    path = np.concatenate(mats, axis=0)
    w2c_path = np.asarray(se3_inverse(path))
    Kp = np.tile(np.asarray(res.K)[:1], (len(w2c_path), 1, 1))
    rgb, _, _ = render(state.params, w2c_path, Kp, args.hw, args.hw, cfg,
                       n_alive=state.n_alive)
    frames = [Image.fromarray(
        (np.clip(np.asarray(f), 0, 1) * 255).astype(np.uint8))
        for f in rgb]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=80, loop=0)
    frames[len(frames) // 2].save(os.path.splitext(args.out)[0] + ".png")
    print(f"[turntable] wrote {len(frames)}-frame GIF to {args.out}")


if __name__ == "__main__":
    main()
