"""TPU probe: where do the 435 ms of the bench train step go?

Variants (all at bench scale: 50k gaussians, 8 cams, 224px):
  A  full train_step (loss + grads + adam)              -> the 435 ms
  B  value_and_grad of render-sum loss (no SSIM/L1)     -> rasterize fwd+bwd
  C  rasterize fwd only (render sum)                    -> the 72 ms
  D  value_and_grad of gathered-entry sum (no composite)-> proj+bin+gather f+b
  E  gathered-entry sum fwd only                        -> proj+bin+gather fwd
  F  composite fwd / fwd+bwd on FIXED entries           -> composite isolated
  G  SSIM+L1 loss on fixed rgb, fwd+bwd                 -> loss tail
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

from starst3r_tpu.config import SplatConfig  # noqa: E402
from starst3r_tpu.splat import rasterize as rz_mod  # noqa: E402
from starst3r_tpu.splat.rasterize import (  # noqa: E402
    _bin_gaussians, _composite_tiles_xla, _gather_entries, project_gaussians,
    rasterize)
from starst3r_tpu.splat.train import init_gaussians, train_step  # noqa: E402

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
cfg = SplatConfig()
tile = cfg.tile_size
tw = th = (h + tile - 1) // tile

pts = rng.normal(size=(n_g, 3)).astype(np.float32) * 0.5
pts[:, 2] += 3.0
cols = rng.uniform(size=(n_g, 3)).astype(np.float32)
state = init_gaussians(pts, cols, cfg)
gt = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))
w2c = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_cams, 1, 1))
K = jnp.tile(jnp.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                       jnp.float32)[None], (n_cams, 1, 1))
params = state.params


def timeit(name, fn, iters=8):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(jnp.zeros(()))
    jax.device_get(out)
    log(f"{name}: compile {time.time()-t0:.1f}s")
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(iters):
        x = f(x * 1e-20)
    jax.device_get(x)
    log(f"{name}: steady {(time.time()-t0)/iters*1e3:.1f} ms")


# ---- A: full train step --------------------------------------------------
holder = {"state": state}


def a_step(eps):
    s, loss = train_step(holder["state"], gt + eps, w2c, K, w, h, cfg,
                         n_cams)
    holder["state"] = s
    return loss


timeit("A train_step", a_step)
holder["state"] = state


# ---- B/C: rasterize fwd+bwd / fwd ---------------------------------------
def render_sum(p, eps):
    rgb, alpha, _ = rasterize(
        p["means"] + eps, p["quats"], p["scales"], p["opacities"], p["shN"],
        w2c, K, w, h, sh_degree=cfg.sh_degree, tile_size=tile,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_per_tile=cfg.max_per_tile, chunk=cfg.chunk)
    return jnp.sum(rgb) + jnp.sum(alpha)


def b_fn(eps):
    g = jax.grad(lambda p: render_sum(p, eps))(params)
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))


def c_fn(eps):
    return render_sum(params, eps)


timeit("B rasterize fwd+bwd", b_fn)
timeit("C rasterize fwd", c_fn)


# ---- D/E: proj+bin+gather ------------------------------------------------
def gather_sum(p, eps):
    def pb(vm, k):
        proj = project_gaussians(p["means"] + eps, p["quats"], p["scales"],
                                 p["opacities"], p["shN"], vm, k,
                                 cfg.sh_degree)
        si, starts, bw, counts, ovf, nc = _bin_gaussians(
            proj, tw, th, tile, cfg.max_tiles_per_gaussian,
            cfg.max_per_tile)
        gm, gc, gcl, go = _gather_entries(proj, si, starts, bw,
                                          cfg.max_per_tile)
        return (jnp.sum(gm) + jnp.sum(gc) + jnp.sum(gcl) + jnp.sum(go))
    return jnp.sum(jax.vmap(pb)(w2c, K))


def d_fn(eps):
    g = jax.grad(lambda p: gather_sum(p, eps))(params)
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))


def e_fn(eps):
    return gather_sum(params, eps)


timeit("D proj+bin+gather fwd+bwd", d_fn)
timeit("E proj+bin+gather fwd", e_fn)


# ---- F: composite on fixed entries --------------------------------------
def make_entries():
    def pb(vm, k):
        proj = project_gaussians(params["means"], params["quats"],
                                 params["scales"], params["opacities"],
                                 params["shN"], vm, k, cfg.sh_degree)
        si, starts, bw, counts, ovf, nc = _bin_gaussians(
            proj, tw, th, tile, cfg.max_tiles_per_gaussian,
            cfg.max_per_tile)
        gm, gc, gcl, go = _gather_entries(proj, si, starts, bw,
                                          cfg.max_per_tile)
        return gm, gc, gcl, go, counts
    return jax.jit(jax.vmap(pb))(w2c, K)


G_MEAN, G_CONIC, G_COLOR, G_OP, COUNTS = jax.tree_util.tree_map(
    jax.device_put, make_entries())


def comp_sum(gm, gc, gcl, go, eps):
    rgb, alpha = _composite_tiles_xla(gm + eps, gc, gcl, go, COUNTS, h, w,
                                      tile, tw, th, cfg.chunk)
    return jnp.sum(rgb) + jnp.sum(alpha)


def f_fwd(eps):
    return comp_sum(G_MEAN, G_CONIC, G_COLOR, G_OP, eps)


def f_fb(eps):
    g = jax.grad(comp_sum, argnums=(0, 1, 2, 3))(G_MEAN, G_CONIC, G_COLOR,
                                                 G_OP, eps)
    return sum(jnp.sum(v) for v in g)


timeit("F composite fwd", f_fwd)
timeit("F composite fwd+bwd", f_fb)


# ---- G: loss tail on fixed rgb -------------------------------------------
from starst3r_tpu.ops.ssim import ssim as ssim_fn  # noqa: E402

RGB0 = jnp.asarray(rng.uniform(size=(n_cams, h, w, 3)).astype(np.float32))


def g_fn(eps):
    def loss(rgb):
        l1 = jnp.mean(jnp.abs(gt - rgb), axis=(1, 2, 3))
        sv = jax.vmap(lambda a, b: ssim_fn(a, b))(gt, rgb)
        return jnp.sum(l1 * 0.8 + (1 - sv) * 0.2)
    g = jax.grad(loss)(RGB0 + eps)
    return jnp.sum(g)


timeit("G ssim+l1 fwd+bwd", g_fn)
log("done")
