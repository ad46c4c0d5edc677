"""Staged TPU probe for the Pallas compositing path: tiny scene first to
isolate compile cost, then the bench-scale scene. Logs flush line-by-line so
an outer monitor can tail the file."""
import os
import sys
import time

t00 = time.time()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
log(f"devices={jax.devices()}")

import importlib  # noqa: E402
rz = importlib.import_module("starst3r_tpu.splat.rasterize")

rng = np.random.default_rng(0)


def scene(n, c, f=100.0):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 3e-3, np.float32)
    opac = np.ones((n,), np.float32)
    sh = rng.normal(size=(n, 25, 3)).astype(np.float32) * 0.2
    w2c = np.tile(np.eye(4, dtype=np.float32)[None], (c, 1, 1))
    return tuple(jnp.asarray(x) for x in (pts, quats, scales, opac, sh, w2c))


def run_stage(name, n, cams, hw, iters=3, grad=False, impl="pallas",
              **kw):
    h = w = hw
    means, quats, scales, opac, sh, w2c = scene(n, cams)
    K = jnp.tile(jnp.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]],
                           jnp.float32)[None], (cams, 1, 1))
    log(f"{name}: compile impl={impl} grad={grad} ...")
    t0 = time.time()
    if grad:
        @jax.jit
        def f(m):
            rgb, a, _ = rz.rasterize(m, quats, scales, opac, sh, w2c, K,
                                     w, h, impl=impl, **kw)
            return jnp.sum(rgb * rgb) + jnp.sum(a)

        g = jax.grad(f)
        out = g(means)
        jax.device_get(jnp.sum(out))
        log(f"{name}: grad compiled+run in {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(iters):
            out = g(means + out * 1e-20)
        jax.device_get(jnp.sum(out))
        log(f"{name}: grad steady {((time.time()-t0)/iters)*1e3:.1f} ms")
        return out
    rgb, a, info = rz.rasterize(means, quats, scales, opac, sh, w2c, K,
                                w, h, impl=impl, **kw)
    s = jax.device_get(jnp.sum(rgb))
    log(f"{name}: fwd compiled+run in {time.time()-t0:.1f}s sum={s:.3f}")
    t0 = time.time()
    x = jnp.zeros(())
    for _ in range(iters):
        rgb, a, _ = rz.rasterize(means + x * 1e-20, quats, scales, opac, sh,
                                 w2c, K, w, h, impl=impl, **kw)
        x = jnp.sum(rgb)
    jax.device_get(x)
    log(f"{name}: fwd steady {((time.time()-t0)/iters)*1e3:.1f} ms")
    return rgb


stage = sys.argv[1] if len(sys.argv) > 1 else "all"

if stage in ("tiny", "all"):
    r_p = run_stage("tiny-pallas-fwd", 2048, 1, 64, impl="pallas")
    r_r = run_stage("tiny-ref-fwd", 2048, 1, 64, impl="ref")
    log(f"tiny fwd maxdiff={float(jnp.max(jnp.abs(r_p - r_r))):.2e}")
    g_p = run_stage("tiny-pallas-grad", 2048, 1, 64, grad=True,
                    impl="pallas")
    g_r = run_stage("tiny-ref-grad", 2048, 1, 64, grad=True, impl="ref")
    d = float(jnp.max(jnp.abs(g_p - g_r)))
    m = float(jnp.max(jnp.abs(g_r)))
    log(f"tiny grad maxdiff={d:.2e} (ref grad max={m:.2e})")

if stage in ("bench", "all"):
    run_stage("bench-pallas-fwd", 50_000, 8, 224, impl="pallas")
    run_stage("bench-pallas-grad", 50_000, 8, 224, grad=True, impl="pallas")
    run_stage("bench-ref-fwd", 50_000, 8, 224, impl="ref")
    run_stage("bench-ref-grad", 50_000, 8, 224, grad=True, impl="ref")

log("done")
