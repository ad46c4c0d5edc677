"""BASELINE config-5 scale probe on the real chip (VERDICT r3 #3):

1. 1M-Gaussian-pool 3DGS training step (224², 8 cams) — wall clock per
   step with binning reuse, plus peak memory from device stats.
2. 200-keyframe Schur-complement GN iteration (scatter-free one-hot /
   V^T V reduction) — wall clock per accepted iteration.

Run: python tools/probe_config5.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from starst3r_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from starst3r_tpu.config import SplatConfig
    from starst3r_tpu.splat.train import (_autobudget_cfg, compute_bins,
                                          init_gaussians, train_step)

    rng = np.random.default_rng(0)

    # ---- 1M Gaussians ----------------------------------------------------
    n_g = 1_000_000
    n_cams, h, w = 8, 224, 224
    pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.8
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
    cfg = SplatConfig(rebin_every=4)
    state = init_gaussians(pts, cols, cfg)
    gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
    w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
    K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2],
                            [0, 0, 1]], jnp.float32)[None], (n_cams, 1, 1))
    t0 = time.time()
    scfg = _autobudget_cfg(state, w2c, K, w, h, cfg)
    print("autobudget", scfg.max_tiles_per_gaussian, scfg.max_per_tile,
          round(time.time() - t0, 1), flush=True)
    bins = compute_bins(state.params, w2c, K, w, h, scfg,
                        n_alive=state.n_alive)
    t0 = time.time()
    jax.block_until_ready(bins.counts)
    print("entries", int(jax.device_get(bins.counts.sum())), flush=True)

    def chain(fn, iters, warmup=2):
        out = jnp.asarray(0.0, jnp.float32)
        for _ in range(warmup):
            out = fn(out)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(out)
        jax.device_get(out)
        return (time.perf_counter() - t0) / iters

    holder = {"s": state}

    def step(carry):
        s, loss = train_step(holder["s"], gt + carry * 1e-20, w2c, K, w, h,
                             scfg, n_cams, bins=bins)
        holder["s"] = s
        return loss

    dt = chain(step, 5)
    print("1M step ms", round(dt * 1e3, 1),
          "g*steps/s", round(n_g / dt), flush=True)

    def bin_once(carry):
        b = compute_bins(
            {**holder["s"].params,
             "means": holder["s"].params["means"] + carry * 1e-20},
            w2c, K, w, h, scfg, n_alive=holder["s"].n_alive)
        return b.counts.sum().astype(jnp.float32)

    dtb = chain(bin_once, 5)
    print("1M bin ms", round(dtb * 1e3, 1), flush=True)
    try:
        ms = jax.devices()[0].memory_stats()
        print("peak_bytes_mb", round(ms.get("peak_bytes_in_use", 0) / 1e6),
              flush=True)
    except Exception:
        pass

    # ---- 200-keyframe Schur ---------------------------------------------
    import sys
    sys.path.insert(0, "tests")
    from test_schur import _make_seq, _perturb
    from starst3r_tpu.alignment.schur import schur_refine

    d = _make_seq(np.random.default_rng(0), c=200, npts=16, window=3)
    noisy = _perturb(d["cam2w"], np.random.default_rng(1), rot=0.01,
                     tr=0.03)
    print("tracks", d["tracks"].cam.shape, flush=True)
    t0 = time.time()
    out, _, costs = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], iters=2, opt_focal=False)
    dt_first = time.time() - t0
    t0 = time.time()
    out, _, costs = schur_refine(
        noisy, d["focals"], d["pps"], d["depths"], d["core_pix"],
        d["tracks"], iters=5, opt_focal=False)
    dt = (time.time() - t0) / 5
    print("schur200 s/iter", round(dt, 3), "first(compile)",
          round(dt_first, 1), "cost", costs[0], "->", costs[-1],
          flush=True)


if __name__ == "__main__":
    main()
