"""TPU probe: split project+bin+gather cost at bench scale.

P  project fwd / fwd+bwd (pure math, no sort)
S1 emit entries + first sort (2-key) fwd only
S1p packed single-key variant of the first sort
S2 second sort (by_gauss)
G  gather fwd / fwd+bwd given precomputed index structure
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


def proj_only(eps):
    def pb(vm, k):
        p = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        return (jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.colors)
                + jnp.sum(p.depths))
    return jnp.sum(jax.vmap(pb)(w2c, K))


def entries(proj):
    t_total = tw * th
    tx0 = jnp.floor((proj.means2d[:, 0] - proj.radii) / tile)
    ty0 = jnp.floor((proj.means2d[:, 1] - proj.radii) / tile)
    tx1 = jnp.floor((proj.means2d[:, 0] + proj.radii) / tile)
    ty1 = jnp.floor((proj.means2d[:, 1] + proj.radii) / tile)
    tx0 = jnp.clip(tx0, 0, tw - 1).astype(jnp.int32)
    ty0 = jnp.clip(ty0, 0, th - 1).astype(jnp.int32)
    tx1 = jnp.clip(tx1, 0, tw - 1).astype(jnp.int32)
    ty1 = jnp.clip(ty1, 0, th - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    area = bw * (ty1 - ty0 + 1)
    e = jnp.arange(MT, dtype=jnp.int32)
    ex = e[None, :] % bw[:, None]
    ey = e[None, :] // bw[:, None]
    ty = ty0[:, None] + ey
    tx = tx0[:, None] + ex
    ok = proj.valid[:, None] & (e[None, :] < area[:, None]) & (ty <= ty1[:, None])
    tile_id = jnp.where(ok, ty * tw + tx, t_total).astype(jnp.int32)
    return tile_id


def sort1(eps):
    def pb(vm, k):
        p = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        tile_id = entries(p)
        flat_tile = tile_id.reshape(-1)
        flat_depth = jnp.broadcast_to(p.depths[:, None], tile_id.shape).reshape(-1)
        flat_idx = jnp.broadcast_to(
            jnp.arange(n_g, dtype=jnp.int32)[:, None], tile_id.shape).reshape(-1)
        st_, _, si = jax.lax.sort((flat_tile, flat_depth, flat_idx), num_keys=2)
        return jnp.sum(st_) + jnp.sum(si)
    return jnp.sum(jax.vmap(pb)(w2c, K).astype(jnp.float32))


# the packed int32 key reserves 22 low bits for depth: tile ids must fit
# the remaining 9 magnitude bits or the key silently overflows
assert T_TOTAL < (1 << (31 - 22)), T_TOTAL


def sort1_packed(eps):
    def pb(vm, k):
        p = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
        tile_id = entries(p)
        # pack (tile, depth) into one int32 key: tile in the high bits,
        # 22-bit quantized depth in the low bits
        zq = jnp.clip(p.depths / 20.0, 0.0, 1.0) * ((1 << 22) - 1)
        zq = zq.astype(jnp.int32)
        key = tile_id * (1 << 22) + zq[:, None]
        flat_key = key.reshape(-1)
        flat_idx = jnp.broadcast_to(
            jnp.arange(n_g, dtype=jnp.int32)[:, None], key.shape).reshape(-1)
        sk, si = jax.lax.sort((flat_key, flat_idx), num_keys=1)
        return jnp.sum(sk) + jnp.sum(si)
    return jnp.sum(jax.vmap(pb)(w2c, K).astype(jnp.float32))


L = n_g * MT
r2 = np.random.default_rng(1)
SIDX = jnp.asarray(np.tile(r2.permutation(L).astype(np.int32)[None],
                           (n_cams, 1)))


def sort2(eps):
    def pb(si):
        _, bg = jax.lax.sort(
            (si, jnp.arange(L, dtype=jnp.int32)), num_keys=1)
        return jnp.sum(bg)
    return jnp.sum(jax.vmap(pb)(SIDX).astype(jnp.float32)) + eps


timeit("P project fwd", proj_only)
timeit("P project fwd+bwd", proj_only, do_grad=True)
timeit("S1 2-key sort fwd", sort1)
timeit("S1p packed 1-key sort fwd", sort1_packed)
timeit("S2 by_gauss sort", sort2)
log("done")
