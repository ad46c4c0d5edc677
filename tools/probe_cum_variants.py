"""TPU probe: compositing inner-loop variants at bench scale.

Compares the committed `_composite_xla` (jnp.cumprod/cumsum inside the
chunk scan) against a triangular-matmul variant that maps the cumulative
ops onto the MXU (log -> (c,c) lower/upper-triangular matmul -> exp), in
forward and forward+backward, on identical pre-binned entries.
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
import functools  # noqa: E402
from starst3r_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
log(f"devices={jax.devices()}")

import importlib  # noqa: E402
rz = importlib.import_module("starst3r_tpu.splat.rasterize")
from starst3r_tpu.config import SplatConfig  # noqa: E402
from tools.timing import chain_time  # noqa: E402

rng = np.random.default_rng(0)
n_g = 50_000
n_cams, h, w = 8, 224, 224
cfg = SplatConfig()
tile = cfg.tile_size
tw = th = (h + tile - 1) // tile
CH = cfg.chunk

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


@jax.jit
def make_entries(means):
    def pb(vm, k):
        proj = rz.project_gaussians(means, *args[1:], vm, k, cfg.sh_degree)
        _, sidx, starts, _ = rz._bin_gaussians(
            proj, tw, th, tile, cfg.max_tiles_per_gaussian)
        gm, gc, gcl, go, counts, _ = rz._gather_entries(
            proj, sidx, starts, cfg.max_per_tile)
        return gm, gc, gcl, go
    return jax.vmap(pb)(w2c, K)


g_mean, g_conic, g_color, g_op = jax.device_get(make_entries(args[0]))
g_mean, g_conic, g_color, g_op = (jnp.asarray(g_mean), jnp.asarray(g_conic),
                                  jnp.asarray(g_color), jnp.asarray(g_op))
log(f"entries ready: {g_op.shape} nonzero={float((g_op>0).mean()):.3f}")

pix_x, pix_y = rz._tile_pix(tw, th, tile)


# ---------------- variant B: triangular matmul cumulatives ----------------
def _tri(ch):
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return ((c <= r).astype(jnp.float32), (c >= r).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def comp_tri(g_mean, g_conic, g_color, g_op, pix_x, pix_y, chunk):
    return _tri_fwd_scan(g_mean, g_conic, g_color, g_op, pix_x, pix_y,
                         chunk)


def _tri_fwd_scan(g_mean, g_conic, g_color, g_op, pix_x, pix_y, chunk):
    t_total, k = g_op.shape
    p = pix_x.shape[1]
    n_chunks = k // chunk
    linc, _ = _tri(chunk)

    def body(carry, s):
        acc_rgb, acc_t = carry
        sl = jax.lax.dynamic_slice_in_dim
        cm = sl(g_mean, s * chunk, chunk, 1)
        cc = sl(g_conic, s * chunk, chunk, 1)
        ccol = sl(g_color, s * chunk, chunk, 1)
        cop = sl(g_op, s * chunk, chunk, 1)
        alpha, _, _, _, _, _ = rz._alpha_chunk(cm, cc, cop, pix_x, pix_y)
        log_om = jnp.log1p(-alpha)                    # (T, c, P)
        pref = jnp.einsum("ij,tjp->tip", linc, log_om)  # MXU prefix
        cum_last = jnp.exp(pref[:, -1, :])
        wgt = alpha * jnp.exp(pref - log_om) * acc_t[:, None, :]
        acc_rgb = acc_rgb + jnp.einsum("tcp,tcd->tpd", wgt, ccol)
        acc_t = acc_t * cum_last
        return (acc_rgb, acc_t), None

    init = (jnp.zeros((t_total, p, 3), jnp.float32),
            jnp.ones((t_total, p), jnp.float32))
    (rgb, trans), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return rgb, trans


def _tri_fwd(g_mean, g_conic, g_color, g_op, pix_x, pix_y, chunk):
    rgb, trans = _tri_fwd_scan(g_mean, g_conic, g_color, g_op, pix_x,
                               pix_y, chunk)
    return (rgb, trans), (g_mean, g_conic, g_color, g_op, pix_x, pix_y,
                          trans)


def _tri_bwd(chunk, res, cts):
    g_mean, g_conic, g_color, g_op, pix_x, pix_y, t_fin = res
    g_rgb, g_trans = cts
    t_total, k = g_op.shape
    n_chunks = k // chunk
    _, usuf = _tri(chunk)
    gt_term = (g_trans * t_fin)[:, None, :]

    def body(carry, s):
        t_after, s_carry = carry
        sl = jax.lax.dynamic_slice_in_dim
        cm = sl(g_mean, s * chunk, chunk, 1)
        cc = sl(g_conic, s * chunk, chunk, 1)
        ccol = sl(g_color, s * chunk, chunk, 1)
        cop = sl(g_op, s * chunk, chunk, 1)
        alpha, raw, expsig, ok, dx, dy = rz._alpha_chunk(cm, cc, cop,
                                                         pix_x, pix_y)
        log_om = jnp.log1p(-alpha)
        rev_cum = jnp.exp(jnp.einsum("ij,tjp->tip", usuf, log_om))
        t_j = t_after[:, None, :] / jnp.maximum(rev_cum, 1e-30)
        cdotg = jnp.einsum("tcd,tpd->tcp", ccol, g_rgb)
        w_j = alpha * t_j
        contrib = w_j * cdotg
        suf_incl = jnp.einsum("ij,tjp->tip", usuf, contrib)
        s_j = (suf_incl - contrib) + s_carry[:, None, :]
        inv_1m = 1.0 / jnp.maximum(1.0 - alpha, 1e-3)
        dalpha = t_j * cdotg - s_j * inv_1m - gt_term * inv_1m
        interior = ok & (raw < 0.999)
        draw = jnp.where(interior, dalpha, 0.0)
        dsigma = -draw * raw
        a = cc[:, :, 0:1]
        b = cc[:, :, 1:2]
        c_ = cc[:, :, 2:3]
        d_mx = jnp.sum(dsigma * (-(a * dx + b * dy)), axis=2)
        d_my = jnp.sum(dsigma * (-(c_ * dy + b * dx)), axis=2)
        d_ca = jnp.sum(dsigma * (0.5 * dx * dx), axis=2)
        d_cb = jnp.sum(dsigma * (dx * dy), axis=2)
        d_cc = jnp.sum(dsigma * (0.5 * dy * dy), axis=2)
        d_op = jnp.sum(draw * expsig, axis=2)
        d_col = jnp.einsum("tcp,tpd->tcd", w_j, g_rgb)
        carry = (t_after / jnp.maximum(rev_cum[:, 0, :], 1e-30),
                 s_carry + suf_incl[:, 0, :])
        grads = (jnp.stack([d_mx, d_my], -1),
                 jnp.stack([d_ca, d_cb, d_cc], -1), d_col, d_op)
        return carry, grads

    init = (t_fin, jnp.zeros_like(t_fin))
    s_rev = jnp.arange(n_chunks - 1, -1, -1)
    _, (dm, dc, dcol, dop) = jax.lax.scan(body, init, s_rev)

    def unstack(x):
        x = x[::-1]
        x = jnp.moveaxis(x, 0, 1)
        return x.reshape((t_total, k) + x.shape[3:])

    return (unstack(dm), unstack(dc), unstack(dcol), unstack(dop),
            jnp.zeros_like(pix_x), jnp.zeros_like(pix_y))


comp_tri.defvjp(_tri_fwd, _tri_bwd)


def bench_variant(name, comp_fn):
    @jax.jit
    def fwd(eps):
        def one(gm, gc, gcl, go):
            rgb, tr = comp_fn(gm + eps, gc, gcl, go, pix_x, pix_y, CH)
            return jnp.sum(rgb) + jnp.sum(tr)
        return jnp.sum(jax.vmap(one)(g_mean, g_conic, g_color, g_op))

    t0 = time.time()
    jax.device_get(fwd(jnp.zeros(())))
    log(f"{name} fwd compile {time.time()-t0:.1f}s")
    dt = chain_time(lambda: None, 0, 0) if False else None
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(8):
        x = fwd(x * 1e-20)
    jax.device_get(x)
    log(f"{name} fwd steady {(time.time()-t0)/8*1e3:.1f} ms")

    grad = jax.jit(jax.grad(fwd))
    t0 = time.time()
    jax.device_get(grad(jnp.zeros(())))
    log(f"{name} grad compile {time.time()-t0:.1f}s")
    x = jnp.zeros(())
    t0 = time.time()
    for _ in range(8):
        x = grad(x * 1e-20)
    jax.device_get(x)
    log(f"{name} grad steady {(time.time()-t0)/8*1e3:.1f} ms")
    return fwd, grad


f_a, g_a = bench_variant("cumprod(current)", rz._composite_xla)
f_b, g_b = bench_variant("tri-matmul", comp_tri)

va, vb = float(f_a(jnp.zeros(()))), float(f_b(jnp.zeros(())))
ga_, gb_ = float(g_a(jnp.zeros(()))), float(g_b(jnp.zeros(())))
log(f"parity fwd: {va:.4f} vs {vb:.4f} (rel {abs(va-vb)/abs(va):.2e})")
log(f"parity grad: {ga_:.6f} vs {gb_:.6f}")
log("done")
