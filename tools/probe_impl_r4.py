"""Round-4 probe: xla vs pallas rasterize at the bench's autobudget config.

Measures fwd and fwd+bwd (grad of a render-sum loss) for impl in
{xla, pallas}, at bench scale (50k gaussians, 8 cams, 224px) with the
autobudgeted buckets (max_tiles_per_gaussian=4, max_per_tile=1024), plus
output parity between the two.
"""
import dataclasses
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
from starst3r_tpu.config import SplatConfig  # noqa: E402
from starst3r_tpu.splat.train import (_autobudget_cfg,  # noqa: E402
                                      init_gaussians)

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
cfg = SplatConfig()
state = init_gaussians(pts, cols, cfg)
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))
scfg = _autobudget_cfg(state, w2c, K, w, h, cfg)
log(f"budget: mtpg={scfg.max_tiles_per_gaussian} mpt={scfg.max_per_tile} "
    f"chunk={scfg.chunk}")
p = state.params
kw = dict(sh_degree=cfg.sh_degree, tile_size=cfg.tile_size,
          max_tiles_per_gaussian=scfg.max_tiles_per_gaussian,
          max_per_tile=scfg.max_per_tile, chunk=scfg.chunk)


def fwd(impl):
    @jax.jit
    def f(means):
        rgb, a, _ = rz.rasterize(means, p["quats"], p["scales"],
                                 p["opacities"], p["shN"], w2c, K, w, h,
                                 impl=impl, **kw)
        return rgb, a
    t0 = time.time()
    rgb, a = f(p["means"])
    jax.block_until_ready(rgb)
    log(f"  {impl} fwd compile {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(8):
        rgb, a = f(p["means"])
    jax.block_until_ready(rgb)
    log(f"  {impl} fwd steady {(time.time()-t0)/8*1e3:.1f} ms")
    return rgb, a


def fwdbwd(impl):
    @jax.jit
    def g(means, quats, scales, ops, sh):
        def loss(args):
            rgb, a, _ = rz.rasterize(*args, w2c, K, w, h, impl=impl, **kw)
            return jnp.sum(rgb * rgb) + jnp.sum(a)
        return jax.grad(loss)((means, quats, scales, ops, sh))
    t0 = time.time()
    out = g(p["means"], p["quats"], p["scales"], p["opacities"], p["shN"])
    jax.block_until_ready(out)
    log(f"  {impl} fwd+bwd compile {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(8):
        out = g(p["means"], p["quats"], p["scales"], p["opacities"],
                p["shN"])
    jax.block_until_ready(out)
    log(f"  {impl} fwd+bwd steady {(time.time()-t0)/8*1e3:.1f} ms")
    return out


res = {}
for impl in ("xla", "pallas"):
    log(f"impl={impl}")
    res[impl] = fwd(impl)
    fwdbwd(impl)

d_rgb = float(jnp.max(jnp.abs(res["xla"][0] - res["pallas"][0])))
d_a = float(jnp.max(jnp.abs(res["xla"][1] - res["pallas"][1])))
log(f"parity xla-vs-pallas: rgb {d_rgb:.2e} alpha {d_a:.2e}")
log("done")
