"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: Gaussians-optimized per second (3DGS training throughput on a
synthetic 50k-Gaussian / 8-camera / 224px scene — BASELINE config 3 scale),
plus auxiliary metrics (pairwise ViT inference pairs/s, rasterizer fps) in
the same record. The reference publishes no numbers (BASELINE.md), so
vs_baseline is the ratio against the previous recorded run of this harness
(BENCH_LOCAL.json), 1.0 on first run.
"""

import json
import os
import time

import numpy as np


def _timeit(fn, warmup=2, iters=10):
    """Honest per-iteration wall time on the axon TPU tunnel.

    `jax.block_until_ready` was observed to return early on this platform
    (~1000x optimistic times), so the only trustworthy measure is to
    wall-clock a chain of DATA-DEPENDENT iterations between two real host
    transfers: `fn(carry)` must fold the previous iteration's scalar output
    into its inputs and return a new scalar, so the device cannot overlap
    or reorder dispatches, and `jax.device_get` of the final scalar cannot
    materialize before the whole chain finishes."""
    import jax
    import jax.numpy as jnp
    out = jnp.asarray(0.0, jnp.float32)
    for _ in range(warmup):
        out = fn(out)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from starst3r_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from starst3r_tpu.config import SplatConfig, ModelConfig
    from starst3r_tpu.models.mast3r import Mast3rModel
    from starst3r_tpu.splat.train import init_gaussians, train_step

    rng = np.random.default_rng(0)

    # ---------------- 3DGS training throughput ----------------------------
    n_g = 50_000
    n_cams, h, w = 8, 224, 224
    pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
    cfg = SplatConfig()
    state = init_gaussians(pts, cols, cfg)
    gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
    w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
    K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                           jnp.float32)[None], (n_cams, 1, 1))

    holder = {"state": state}

    def step(carry):
        # fold the previous loss into the GT (×1e-20: numerically inert) so
        # successive steps form a true device-side dependency chain
        s, loss = train_step(holder["state"], gt + carry * 1e-20, w2c, K,
                             w, h, cfg, n_cams)
        holder["state"] = s
        return loss

    dt_step = _timeit(step, warmup=2, iters=10)
    gauss_per_s = n_g / dt_step

    # ---------------- pairwise inference throughput -----------------------
    mcfg = ModelConfig.base()
    model = Mast3rModel.init_random(mcfg, image_hw=(224, 224))
    b = 16   # large pair batch: 196-token GEMMs need >=3k rows to fill MXU
    img = jnp.asarray(rng.uniform(-1, 1, size=(b, 224, 224, 3))
                      .astype(np.float32))

    def infer(carry):
        # scalar reduction keeps the host transfer tiny while depending on
        # the full forward pass; carry chains successive dispatches
        x = img + carry * 1e-20
        return model.infer_pair_batch(x, x)["pts1"].sum()

    dt_inf = _timeit(infer, warmup=2, iters=5)
    pairs_per_s = b / dt_inf

    # ---------------- render-only fps -------------------------------------
    from starst3r_tpu.splat.train import render

    params = holder["state"].params

    def render_once(carry):
        p = dict(params)
        p["means"] = p["means"] + carry * 1e-20
        rgb, _, _ = render(p, w2c, K, w, h, cfg)
        return rgb.sum()

    dt_render = _timeit(render_once, warmup=2, iters=10)
    fps = n_cams / dt_render

    # ---------------- quality: GA ATE/RPE on a planted scene --------------
    # (BASELINE.md operational metrics; utils/synthetic.py scene is exact up
    # to ~1px core-grid snapping)
    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.config import GAConfig
    from starst3r_tpu.utils.eval import ate_rmse, rpe_rotation_deg
    from starst3r_tpu.utils.synthetic import synthetic_ga_scene

    data, mst, gt_poses, _ = synthetic_ga_scene(n_cams=4, hw=128,
                                                subsample=4)
    result, _ = run_global_alignment(data, mst,
                                     GAConfig(niter1=300, niter2=120))
    pred = np.asarray(result.cam2w)
    traj_scale = float(np.linalg.norm(
        gt_poses[:, :3, 3] - gt_poses[:, :3, 3].mean(0), axis=1).max())
    ga_ate = float(ate_rmse(pred, gt_poses))
    ga_rpe = float(rpe_rotation_deg(pred, gt_poses))

    # ---------------- quality: splat optimization PSNR --------------------
    # optimize a fresh init toward renders of a DIFFERENT gaussian scene
    from starst3r_tpu.ops.ssim import psnr as psnr_fn

    import dataclasses

    qcfg = dataclasses.replace(cfg, init_scale=2e-2)
    tgt_pts = rng.normal(size=(4000, 3)).astype(np.float32) * 0.4
    tgt_pts[:, 2] += 3.0
    tgt_cols = rng.uniform(size=(4000, 3)).astype(np.float32)
    tgt_state = init_gaussians(tgt_pts, tgt_cols, qcfg, seed=1)
    tgt_gt = jnp.clip(render(tgt_state.params, w2c, K, w, h, qcfg)[0],
                      0.0, 1.0)
    opt_state = init_gaussians(
        tgt_pts + rng.normal(size=tgt_pts.shape).astype(np.float32) * 0.05,
        rng.uniform(size=(4000, 3)).astype(np.float32), qcfg, seed=2)
    rgb0 = jnp.clip(render(opt_state.params, w2c, K, w, h, qcfg)[0], 0, 1)
    psnr0 = float(np.mean([psnr_fn(tgt_gt[i], rgb0[i])
                           for i in range(n_cams)]))
    from starst3r_tpu.splat.train import run_optim
    opt_state, _ = run_optim(opt_state, np.asarray(tgt_gt), np.asarray(w2c),
                             np.asarray(K), 150, qcfg)
    rgb_opt = jnp.clip(render(opt_state.params, w2c, K, w, h, qcfg)[0],
                       0, 1)
    splat_psnr = float(np.mean([psnr_fn(tgt_gt[i], rgb_opt[i])
                                for i in range(n_cams)]))

    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LOCAL.json")
    vs_baseline = 1.0
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            if prev.get("value"):
                vs_baseline = gauss_per_s / float(prev["value"])
        except Exception:
            pass

    record = {
        "metric": "gaussians_optimized_per_s",
        "value": round(gauss_per_s, 1),
        "unit": "gaussians*steps/s",
        "vs_baseline": round(vs_baseline, 3),
        "aux": {
            "splat_step_ms": round(dt_step * 1e3, 2),
            "render_fps_224": round(fps, 1),
            "vit_base_pairs_per_s_224": round(pairs_per_s, 2),
            "n_gaussians": n_g,
            "n_cameras": n_cams,
            "device": str(jax.devices()[0]),
            # quality (BASELINE.md operational metrics)
            "ga_ate": round(ga_ate, 5),
            "ga_ate_frac_of_traj": round(ga_ate / traj_scale, 4),
            "ga_rpe_rot_deg": round(ga_rpe, 3),
            "splat_psnr_150_iters": round(splat_psnr, 2),
            "splat_psnr_init": round(psnr0, 2),
        },
    }
    try:
        with open(prev_path, "w") as f:
            json.dump(record, f)
    except Exception:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
