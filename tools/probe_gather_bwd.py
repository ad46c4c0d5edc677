"""TPU probe: gather-backward variants for the tile-entry gather.

The autodiff VJP of `packed[gidx]` is a scatter-add of (T*K, 9) rows into
(N, 9) — TPU scatters serialize. Variant B re-expresses the backward as
gather + one int32 sort (inverse permutation) + dense segment reduce.
"""
import os
import sys
import time

t00 = time.time()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)


import functools  # noqa: E402
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


# ---- variant B: custom-vjp gather with sort-based backward ----------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_sortbwd(packed, sorted_idx, perm, starts, max_per_tile):
    return _gb_fwd(packed, sorted_idx, starts, max_per_tile)


def _gb_fwd(packed, sorted_idx, starts, max_per_tile):
    slot = jnp.arange(max_per_tile, dtype=jnp.int32)
    ent = starts[:-1, None] + slot[None, :]
    ent_valid = ent < starts[1:, None]
    ent = jnp.minimum(ent, sorted_idx.shape[0] - 1)
    gidx = sorted_idx[ent]
    ga = packed[gidx]
    return jnp.where(ent_valid[..., None], ga, 0.0)


def _gb_fwd_rule(packed, sorted_idx, perm, starts, max_per_tile):
    out = _gb_fwd(packed, sorted_idx, starts, max_per_tile)
    return out, (perm, starts, packed.shape[0])


def _gb_bwd_rule(max_per_tile, res, g):
    perm, starts, n = res
    l = perm.shape[0]
    e = l // n
    # g: (T, K, 9). sorted position s lives in tile t at slot s - starts[t]
    s_pos = jnp.arange(l, dtype=jnp.int32)
    t_of = jnp.searchsorted(starts, s_pos, side="right") - 1
    slot = s_pos - starts[t_of]
    ok = slot < max_per_tile
    gsorted = jnp.where(ok[:, None],
                        g[t_of, jnp.minimum(slot, max_per_tile - 1)], 0.0)
    # inverse permutation via one int32 sort: perm[s] = original flat entry
    _, inv = jax.lax.sort_key_val(perm, s_pos)
    gflat = gsorted[inv]                       # (L, 9) in original order
    gpacked = gflat.reshape(n, e, g.shape[-1]).sum(axis=1)
    return gpacked, None, None, None


gather_sortbwd.defvjp(_gb_fwd_rule, _gb_bwd_rule)


def make_projbin(variant):
    def fn(eps):
        def pb(vm, k):
            proj = rz.project_gaussians(args[0] + eps, *args[1:], vm, k, 1)
            t_total = tw * th
            nn = proj.means2d.shape[0]
            # replicate _bin_gaussians but keep the sort permutation
            r = proj.radii
            tx0 = ((proj.means2d[:, 0] - r) // tile).astype(jnp.int32)
            ty0 = ((proj.means2d[:, 1] - r) // tile).astype(jnp.int32)
            tx1 = ((proj.means2d[:, 0] + r) // tile).astype(jnp.int32)
            ty1 = ((proj.means2d[:, 1] + r) // tile).astype(jnp.int32)
            tx0 = jnp.clip(tx0, 0, tw - 1)
            ty0 = jnp.clip(ty0, 0, th - 1)
            tx1 = jnp.clip(tx1, 0, tw - 1)
            ty1 = jnp.clip(ty1, 0, th - 1)
            bw = tx1 - tx0 + 1
            area = bw * (ty1 - ty0 + 1)
            e = jnp.arange(MT, dtype=jnp.int32)
            ex = e[None, :] % bw[:, None]
            ey = e[None, :] // bw[:, None]
            ty = ty0[:, None] + ey
            tx = tx0[:, None] + ex
            okm = proj.valid[:, None] & (e[None, :] < area[:, None]) \
                & (ty <= ty1[:, None])
            tile_id = jnp.where(okm, ty * tw + tx, t_total).astype(jnp.int32)
            flat_tile = tile_id.reshape(-1)
            flat_depth = jnp.broadcast_to(
                proj.depths[:, None], tile_id.shape).reshape(-1)
            flat_idx = jnp.broadcast_to(
                jnp.arange(nn, dtype=jnp.int32)[:, None],
                tile_id.shape).reshape(-1)
            arange = jnp.arange(flat_tile.shape[0], dtype=jnp.int32)
            st_tile, _, sorted_idx, perm = jax.lax.sort(
                (flat_tile, flat_depth, flat_idx, arange), num_keys=2)
            starts = jnp.searchsorted(
                st_tile, jnp.arange(t_total + 1, dtype=jnp.int32))
            packed = jnp.concatenate(
                [proj.means2d, proj.conics, proj.colors,
                 proj.opacities[:, None]], axis=1)
            if variant == "scatter":
                slot = jnp.arange(MPT, dtype=jnp.int32)
                ent = starts[:-1, None] + slot[None, :]
                ent_valid = ent < starts[1:, None]
                ent = jnp.minimum(ent, sorted_idx.shape[0] - 1)
                ga = packed[sorted_idx[ent]]
                ga = jnp.where(ent_valid[..., None], ga, 0.0)
            else:
                # perm here: position -> original flat entry is sorted_... we
                # sorted payload arange -> at new pos s, perm[s] = orig entry
                ga = gather_sortbwd(packed, sorted_idx, perm, starts, MPT)
            return jnp.sum(ga * ga)
        return jnp.sum(jax.vmap(pb)(w2c, K))
    return fn


timeit("scatter-bwd grad", make_projbin("scatter"), do_grad=True)
timeit("sort-bwd grad", make_projbin("sort"), do_grad=True)

# parity
ga_ = jax.jit(jax.grad(make_projbin("scatter")))(jnp.zeros(()))
gb_ = jax.jit(jax.grad(make_projbin("sort")))(jnp.zeros(()))
log(f"grad parity: {float(ga_):.6f} vs {float(gb_):.6f}")
log("done")
