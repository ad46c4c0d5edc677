"""Pallas TPU kernels for tile-based Gaussian alpha compositing.

This replaces the hot inner stage of the rasterizer (the per-tile
front-to-back compositing loop that gsplat hand-codes in CUDA,
reference call-site starster/gs.py:76-87) with hand-scheduled TPU kernels:

  forward : one program per tile; entries stream through VMEM in chunks of
            CH with an early-exit `while_loop` once every pixel's
            transmittance saturates (< 1/255) or the tile's entry list is
            exhausted — the win CUDA gets from per-pixel loop breaks.
  backward: the gsplat-style reverse sweep. Per tile, walk the processed
            chunks backward reconstructing each entry's transmittance
            T_i = T_end / suffix_prod(1 - alpha) and the suffix color
            accumulator S_i, producing exact per-entry gradients; per-entry
            gradients are segment-summed back to per-Gaussian gradients by
            XLA through the gather's VJP.

Layout notes (TPU tiling): entry attributes are packed as (T, A, K) with the
entry axis K last (lane dimension, K a multiple of 128); pixels are flat
P = tile*tile in lanes. All compute is f32 on the VPU.

The public entry `composite_entries` is a custom_vjp function with identical
semantics to the jnp fallback in rasterize._composite_reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ("composite_entries",)

# attribute rows in the packed (T, A, K) tensor
_A_MX, _A_MY, _A_CA, _A_CB, _A_CC, _A_CR, _A_CG, _A_CBL, _A_OP = range(9)
_NATTR = 9
_SIGMA_MAX = 50.0
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.999
_T_MIN = 1.0 / 255.0


def _pix_coords(tile: int, tw: int):
    """Per-tile pixel coordinates relative helpers (static)."""
    p = tile * tile
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (pix % tile).astype(jnp.float32)
    py = (pix // tile).astype(jnp.float32)
    return px, py  # (1, P) each, tile-local


def _chunk_alpha(attr_ref, c0, ch, px, py):
    """alpha (ch, P) for entries [c0, c0+ch) of a tile.

    attr_ref: (1, A, K) VMEM ref; px/py: (1, P) absolute pixel centers.
    Slices the REF with pl.ds (Mosaic has no dynamic_slice on values).
    """
    c0 = pl.multiple_of(c0, 128)                # lane-dim slices need 128x
    a = attr_ref[0, :, pl.ds(c0, ch)]           # (A, ch)
    mx = a[_A_MX][:, None]                      # (ch, 1)
    my = a[_A_MY][:, None]
    ca = a[_A_CA][:, None]
    cb = a[_A_CB][:, None]
    cc = a[_A_CC][:, None]
    op = a[_A_OP][:, None]
    dx = px - mx                                # (ch, P)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    expsig = jnp.exp(-jnp.clip(sigma, 0.0, _SIGMA_MAX))
    raw = op * expsig
    ok = (sigma >= 0.0) & (raw > _ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(raw, _ALPHA_MAX), 0.0)
    return alpha, a, dx, dy, expsig, ok, raw



def _tri_mats(ch: int):
    """Triangular matmul operators replacing cum{prod,sum} (not lowered by
    Mosaic): Linc[i,j]=1 for j<=i (inclusive prefix), Usuf[i,j]=1 for j>=i
    (inclusive suffix). (ch, ch) f32 — the cumulative ops become MXU matmuls.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    linc = (cidx <= r).astype(jnp.float32)
    usuf = (cidx >= r).astype(jnp.float32)
    return linc, usuf


def _fwd_kernel(count_ref, attr_ref, rgb_ref, tfin_ref, chunks_ref,
                *, tile: int, tw: int, th: int, k: int, ch: int):
    # grid is C*T tiles (cameras folded in); pixel origin depends only on
    # the within-camera tile index
    t_id = pl.program_id(0) % (tw * th)
    x0 = (t_id % tw) * tile
    y0 = (t_id // tw) * tile
    pxl, pyl = _pix_coords(tile, tw)
    px = pxl + x0.astype(jnp.float32) + 0.5
    py = pyl + y0.astype(jnp.float32) + 0.5

    count = count_ref[pl.program_id(0)]
    n_chunks = pl.cdiv(count, ch)
    p = tile * tile

    def cond(carry):
        i, _rgb, t = carry
        return (i < n_chunks) & (jnp.max(t) > _T_MIN)

    def body(carry):
        i, acc, t = carry
        alpha, a, _dx, _dy, _es, _ok, _raw = _chunk_alpha(
            attr_ref, i * ch, ch, px, py)
        # mask entries beyond count
        ent = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + i * ch
        alpha = jnp.where(ent < count, alpha, 0.0)
        one_m = 1.0 - alpha                      # (ch, P)
        linc, _ = _tri_mats(ch)
        log_om = jnp.log(one_m)                  # one_m in [1e-3, 1]
        pref = jnp.dot(linc, log_om,
                       preferred_element_type=jnp.float32)  # inclusive
        cum = jnp.exp(pref)
        cum_excl = jnp.exp(pref - log_om)
        wgt = alpha * cum_excl * t               # (ch, P)
        cr = a[_A_CR][:, None]
        cg = a[_A_CG][:, None]
        cbl = a[_A_CBL][:, None]
        acc = acc + jnp.stack([
            jnp.sum(wgt * cr, axis=0),
            jnp.sum(wgt * cg, axis=0),
            jnp.sum(wgt * cbl, axis=0)], axis=0)  # (3, P)
        t = t * cum[-1:]
        return i + 1, acc, t

    init = (jnp.asarray(0, jnp.int32),
            jnp.zeros((3, p), jnp.float32),
            jnp.ones((1, p), jnp.float32))
    done, rgb, tfin = jax.lax.while_loop(cond, body, init)
    rgb_ref[0] = rgb
    tfin_ref[0] = tfin
    chunks_ref[0] = jnp.full((8, 128), done, jnp.int32)


def _bwd_kernel(count_ref, chunks_ref, attr_ref, tfin_ref, grgb_ref,
                gtfin_ref, gattr_ref, *, tile: int, tw: int, th: int,
                k: int, ch: int):
    """Reverse sweep over the chunks the forward actually processed.

    Derivation (out = sum_j c_j a_j T_j with T_j = prod_{l<j}(1-a_l)):
      dL/dc_j     = a_j T_j . g
      dL/da_j     = T_j (c_j.g) - S_j / (1-a_j) - g_T T_fin / (1-a_j)
                    where S_j = sum_{l>j} c_l a_l T_l . g and g_T is the
                    cotangent of the T_final output (alpha channel).
    T_j is reconstructed backward from T_final via suffix products.
    """
    t_id = pl.program_id(0) % (tw * th)
    x0 = (t_id % tw) * tile
    y0 = (t_id // tw) * tile
    pxl, pyl = _pix_coords(tile, tw)
    px = pxl + x0.astype(jnp.float32) + 0.5
    py = pyl + y0.astype(jnp.float32) + 0.5

    count = count_ref[pl.program_id(0)]
    done = chunks_ref[pl.program_id(0)]
    tfin = tfin_ref[0]                           # (1, P)
    g = grgb_ref[0]                              # (3, P)
    gtf = gtfin_ref[0]                           # (1, P) dL/dT_final

    gattr_ref[0] = jnp.zeros_like(gattr_ref[0])

    def body(step, carry):
        t_after, s_carry = carry                 # both (1, P)
        i = jnp.maximum(done - 1 - step, 0)      # chunk index (clamped)
        live = step < done

        alpha, a, dx, dy, expsig, ok, raw = _chunk_alpha(
            attr_ref, i * ch, ch, px, py)
        ent = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + i * ch
        in_count = ent < count
        alpha = jnp.where(in_count, alpha, 0.0)
        one_m = 1.0 - alpha                      # (ch, P)
        _, usuf = _tri_mats(ch)
        # rev_cum[j] = prod_{l >= j, same chunk} (1 - alpha_l)
        rev_cum = jnp.exp(jnp.dot(usuf, jnp.log(one_m),
                                  preferred_element_type=jnp.float32))
        # transmittance BEFORE entry j: divide the post-chunk value by the
        # suffix product from j on
        t_j = t_after / jnp.maximum(rev_cum, 1e-30)
        cr = a[_A_CR][:, None]
        cg = a[_A_CG][:, None]
        cbl = a[_A_CBL][:, None]
        cdotg = cr * g[0:1] + cg * g[1:2] + cbl * g[2:3]   # (ch, P)
        w_j = alpha * t_j
        contrib = w_j * cdotg
        suf_incl = jnp.dot(usuf, contrib,
                           preferred_element_type=jnp.float32)  # sum_{l>=j}
        s_j = (suf_incl - contrib) + s_carry                # sum_{l>j} global
        inv_one_m = 1.0 / jnp.maximum(one_m, 1e-3)
        dalpha = t_j * cdotg - s_j * inv_one_m - gtf * tfin * inv_one_m
        # alpha clipped at ALPHA_MAX or culled: no grad through sigma/op
        interior = ok & (raw < _ALPHA_MAX) & in_count
        draw = jnp.where(interior, dalpha, 0.0)
        op = a[_A_OP][:, None]
        dsigma = -draw * raw                                # (ch, P)
        ca = a[_A_CA][:, None]
        cb = a[_A_CB][:, None]
        cc = a[_A_CC][:, None]
        d_mx = jnp.sum(dsigma * (-(ca * dx + cb * dy)), axis=1)
        d_my = jnp.sum(dsigma * (-(cc * dy + cb * dx)), axis=1)
        d_ca = jnp.sum(dsigma * 0.5 * dx * dx, axis=1)
        d_cb = jnp.sum(dsigma * dx * dy, axis=1)
        d_cc = jnp.sum(dsigma * 0.5 * dy * dy, axis=1)
        d_op = jnp.sum(draw * expsig, axis=1)
        wmask = jnp.where(in_count, w_j, 0.0)
        d_cr = jnp.sum(wmask * g[0:1], axis=1)
        d_cg = jnp.sum(wmask * g[1:2], axis=1)
        d_cbl = jnp.sum(wmask * g[2:3], axis=1)
        grad_rows = jnp.stack(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_cr, d_cg, d_cbl, d_op],
            axis=0)                                         # (A, ch)

        @pl.when(live)
        def _():
            off = pl.multiple_of(i * ch, 128)
            gattr_ref[0, :, pl.ds(off, ch)] = grad_rows

        new_t_after = t_after / jnp.maximum(rev_cum[0:1], 1e-30)
        new_s = s_carry + suf_incl[0:1]
        t_after = jnp.where(live, new_t_after, t_after)
        s_carry = jnp.where(live, new_s, s_carry)
        return (t_after, s_carry)

    p = tile * tile
    max_chunks = pl.cdiv(k, ch)
    jax.lax.fori_loop(
        0, max_chunks, body,
        (tfin, jnp.zeros((1, p), jnp.float32)))


def _pack_attr(g_mean, g_conic, g_color, g_op):
    """(..., K, 2), (..., K, 3), (..., K, 3), (..., K) -> (..., A, K) f32."""
    return jnp.stack([
        g_mean[..., 0], g_mean[..., 1],
        g_conic[..., 0], g_conic[..., 1], g_conic[..., 2],
        g_color[..., 0], g_color[..., 1], g_color[..., 2],
        g_op], axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_entries(attr, counts, tile: int, tw: int, th: int, ch: int):
    """Composite packed per-tile entries.

    attr: (T, A, K) packed entry attributes (depth-sorted per tile).
    counts: (T,) int32 number of valid entries per tile.
    Returns (rgb (T, 3, P), tfin (T, 1, P)).
    """
    rgb, tfin, _ = _run_fwd(attr, counts, tile, tw, th, ch)
    return rgb, tfin


def _run_fwd(attr, counts, tile, tw, th, ch):
    t_total, a_dim, k = attr.shape
    p = tile * tile
    kern = functools.partial(_fwd_kernel, tile=tile, tw=tw, th=th, k=k,
                             ch=ch)
    # counts rides as a scalar-prefetch arg (SMEM, unpadded); the per-tile
    # chunks-done counter is a (1, 8, 128)-blocked VMEM output (min tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((1, a_dim, k), lambda i, c_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda i, c_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, c_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, c_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    rgb, tfin, chunks = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 8, 128), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(counts, attr)
    return rgb, tfin, chunks[:, 0, 0]


def _fwd_rule(attr, counts, tile, tw, th, ch):
    rgb, tfin, chunks = _run_fwd(attr, counts, tile, tw, th, ch)
    return (rgb, tfin), (attr, counts, tfin, chunks)


def _bwd_rule(tile, tw, th, ch, res, grads):
    attr, counts, tfin, chunks = res
    grgb, gtfin = grads
    t_total, a_dim, k = attr.shape
    p = tile * tile
    kern = functools.partial(_bwd_kernel, tile=tile, tw=tw, th=th, k=k,
                             ch=ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # counts, chunks
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec((1, a_dim, k), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, a_dim, k), lambda i, c0, c1: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    gattr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, a_dim, k), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(counts, chunks, attr, tfin, grgb, gtfin)
    return gattr, None


composite_entries.defvjp(_fwd_rule, _bwd_rule)
