"""Component-level TPU timing of the splat train step: where do the 509ms
go? Times forward-only render, rasterize-grad-only, ssim-only, full step."""
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

from starst3r_tpu.config import SplatConfig  # noqa: E402
from starst3r_tpu.splat.train import init_gaussians  # noqa: E402
import importlib  # noqa: E402
rz = importlib.import_module("starst3r_tpu.splat.rasterize")
from starst3r_tpu.ops.ssim import ssim as ssim_fn  # noqa: E402

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
cfg = SplatConfig()
state = init_gaussians(pts, cols, cfg)
p = state.params
gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))
KW = dict(sh_degree=1, tile_size=16,
          max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
          max_per_tile=cfg.max_per_tile, chunk=cfg.chunk)


def timeit(name, fn, iters=8):
    t0 = time.time()
    out = fn(jnp.zeros(()))
    jax.device_get(out)
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    x = jnp.zeros(())
    for _ in range(iters):
        x = fn(x * 1e-20)
    jax.device_get(x)
    log(f"{name}: steady {(time.time()-t0)/iters*1e3:.1f} ms")


@jax.jit
def fwd_only(eps):
    rgb, a, _ = rz.rasterize(p["means"] + eps, p["quats"], p["scales"],
                             p["opacities"], p["shN"], w2c, K, w, h, **KW)
    return jnp.sum(rgb)


timeit("render fwd (8 cams)", fwd_only)


@jax.jit
def projbin_only(eps):
    # projection + binning + gather, no compositing
    def pb(vm, k):
        proj = rz.project_gaussians(p["means"] + eps, p["quats"],
                                    p["scales"], p["opacities"], p["shN"],
                                    vm, k, 1)
        _, sidx, starts, nclip = rz._bin_gaussians(proj, 14, 14, 16,
                                                   cfg.max_tiles_per_gaussian)
        ents = rz._gather_entries(proj, sidx, starts, cfg.max_per_tile)
        return ents[0]
    gm = jax.vmap(pb)(w2c, K)
    return jnp.sum(gm)


timeit("project+bin+gather fwd", projbin_only)

gloss = jax.jit(jax.grad(lambda m: fwd_only(m)))
timeit("render grad (sum rgb)", lambda eps: jnp.sum(gloss(eps)))

gpb = jax.jit(jax.grad(lambda m: projbin_only(m)))
timeit("project+bin+gather grad", lambda eps: jnp.sum(gpb(eps)))


@jax.jit
def ssim_only(eps):
    img = gt + eps
    return jnp.sum(jax.vmap(lambda a, b: ssim_fn(a, b))(gt, img))


timeit("ssim fwd (8 cams)", ssim_only)
gs = jax.jit(jax.grad(lambda e: ssim_only(e)))
timeit("ssim grad", lambda eps: jnp.sum(gs(eps * jnp.ones_like(gt))))
