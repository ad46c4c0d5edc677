"""TPU probe: decompose the splat train-step backward at bench scale.

A: full rasterize fwd (render path)
B: full rasterize fwd+bwd
C: project+bin+gather fwd+bwd only (the _gather_packed custom VJP)
D: composite fwd only / fwd+bwd only (synthetic entries, while_loop path)
E: composite fwd+bwd with the legacy static-scan backward (for comparison)
"""
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

# `starst3r_tpu.splat.__init__` rebinds the name `rasterize` to the
# function, so a plain `import ... as rz` would grab the function
rz = importlib.import_module("starst3r_tpu.splat.rasterize")  # noqa: E402
from starst3r_tpu.config import SplatConfig  # noqa: E402

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
cfg = SplatConfig()
tile = cfg.tile_size
tw = th = (h + tile - 1) // tile
MT = cfg.max_tiles_per_gaussian
MPT = cfg.max_per_tile
CHUNK = 128
T_TOTAL = tw * th

pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n_g, 1))
scales = np.full((n_g, 3), 3e-3, np.float32)
opac = rng.uniform(0.2, 1.0, size=(n_g,)).astype(np.float32)
sh = rng.normal(size=(n_g, cfg.sh_bands, 3)).astype(np.float32) * 0.2
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))
args = tuple(jnp.asarray(x) for x in (pts, quats, scales, opac, sh))


def timeit(name, fn, iters=8, do_grad=False):
    f = jax.jit(jax.grad(fn)) if do_grad else jax.jit(fn)
    t0 = time.time()
    out = f(jnp.zeros(()))
    jax.device_get(jnp.sum(out) if do_grad else out)
    log(f"{name}: compile {time.time()-t0:.1f}s")
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(iters):
        out = f(x * 1e-20)
        x = jnp.sum(out) if do_grad else out
    jax.device_get(x)
    log(f"{name}: steady {(time.time()-t0)/iters*1e3:.1f} ms")


def full(eps):
    rgb, alpha, _ = rz.rasterize(args[0] + eps, *args[1:], w2c, K, w, h, 1,
                                 tile, MT, MPT, CHUNK)
    return jnp.sum(rgb)


def projbin(eps):
    def pb(vm, k):
        proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        st_, si, starts, bg, _ = rz._bin_gaussians(proj, tw, th, tile, MT)
        gm, gc, gcl, go, counts, _ = rz._gather_entries(
            proj, st_, si, starts, bg, MPT)
        return (jnp.sum(gm * gm) + jnp.sum(gc * gc) + jnp.sum(gcl * gcl)
                + jnp.sum(go * go))
    return jnp.sum(jax.vmap(pb)(w2c, K))


# synthetic composite inputs at the post-binning scale
ct = n_cams * T_TOTAL
r2 = np.random.default_rng(1)
G_MEAN = jnp.asarray(r2.uniform(0, w, size=(ct, MPT, 2)).astype(np.float32))
G_CONIC = jnp.asarray(
    np.tile(np.array([0.3, 0.0, 0.3], np.float32), (ct, MPT, 1)))
G_COLOR = jnp.asarray(r2.uniform(size=(ct, MPT, 3)).astype(np.float32))
occupancy = 320  # realistic max tile count at this density
G_OP = jnp.asarray(
    (r2.uniform(0.2, 0.9, size=(ct, MPT))
     * (np.arange(MPT)[None, :] < occupancy)).astype(np.float32))
PIX_X, PIX_Y = rz._tile_pix(tw, th, tile)
PIX_X = jnp.tile(PIX_X, (n_cams, 1))
PIX_Y = jnp.tile(PIX_Y, (n_cams, 1))
N_ACT = jnp.asarray(np.ceil(occupancy / CHUNK), jnp.float32)


def comp_fwd(eps):
    rgb, trans = rz._composite_xla(G_MEAN + eps, G_CONIC, G_COLOR, G_OP,
                                   PIX_X, PIX_Y, N_ACT, CHUNK)
    return jnp.sum(rgb) + jnp.sum(trans)


timeit("A full fwd", full)
timeit("B full fwd+bwd", full, do_grad=True)
timeit("C projbin fwd+bwd", projbin, do_grad=True)
timeit("D comp fwd", comp_fwd)
timeit("D comp fwd+bwd", comp_fwd, do_grad=True)
log("done")
