"""TPU probe: where do project+bin+gather's 61ms fwd / 115ms grad go?

Times each sub-stage (projection math, sort, searchsorted, gather) and a
packed-single-gather variant (one (N,9) attribute matrix gathered once vs
four separate gathers).
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
rz = importlib.import_module("starst3r_tpu.splat.rasterize")
from starst3r_tpu.config import SplatConfig  # noqa: E402

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
cfg = SplatConfig()
tile = cfg.tile_size
tw = th = (h + tile - 1) // tile
MT = cfg.max_tiles_per_gaussian
MPT = cfg.max_per_tile

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


# --- stage 1: projection math only ---------------------------------------
def proj_only(eps):
    def pb(vm, k):
        proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        return (jnp.sum(proj.means2d) + jnp.sum(proj.conics)
                + jnp.sum(proj.colors) + jnp.sum(proj.depths))
    return jnp.sum(jax.vmap(pb)(w2c, K))


timeit("project only fwd", proj_only)
timeit("project only grad", proj_only, do_grad=True)


# --- stage 2: + binning (sort + searchsorted), no gather -------------------
def bin_only(eps):
    def pb(vm, k):
        proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        st, si, starts, _ = rz._bin_gaussians(proj, tw, th, tile, MT)
        return jnp.sum(si) + jnp.sum(starts)
    return jnp.sum(jax.vmap(pb)(w2c, K).astype(jnp.float32))


timeit("project+bin fwd", bin_only)


# --- stage 3: full current (4 gathers) -------------------------------------
def full_cur(eps):
    def pb(vm, k):
        proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        _, si, starts, _ = rz._bin_gaussians(proj, tw, th, tile, MT)
        gm, gc, gcl, go, counts, ov = rz._gather_entries(proj, si, starts,
                                                         MPT)
        return jnp.sum(gm) + jnp.sum(gc) + jnp.sum(gcl) + jnp.sum(go)
    return jnp.sum(jax.vmap(pb)(w2c, K))


timeit("projbin current fwd", full_cur)
timeit("projbin current grad", full_cur, do_grad=True)


# --- stage 3b: packed single gather ----------------------------------------
def full_packed(eps):
    def pb(vm, k):
        proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        _, si, starts, _ = rz._bin_gaussians(proj, tw, th, tile, MT)
        t_total = tw * th
        ent = jnp.arange(MPT, dtype=jnp.int32)[None, :]
        gpos = starts[:-1, None] + ent
        ent_valid = gpos < starts[1:, None]
        gidx = jnp.where(ent_valid,
                         si[jnp.minimum(gpos, si.shape[0] - 1)], 0)
        packed = jnp.concatenate([
            proj.means2d, proj.conics, proj.colors,
            proj.opacities[:, None]], axis=1)            # (N, 9)
        ga = packed[gidx]                                 # (T, K, 9)
        ga = jnp.where(ent_valid[..., None], ga, 0.0)
        return jnp.sum(ga)
    return jnp.sum(jax.vmap(pb)(w2c, K))


timeit("projbin packed fwd", full_packed)
timeit("projbin packed grad", full_packed, do_grad=True)
log("done")
