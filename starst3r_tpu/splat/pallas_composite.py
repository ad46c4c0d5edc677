"""Pallas TPU kernels for tile-based Gaussian alpha compositing.

Replaces the rasterizer's hot stage — per-tile front-to-back compositing,
forward AND backward (the part gsplat hand-codes in CUDA; reference
call-site starster/gs.py:76-87) — with fused TPU kernels. Why they beat
the XLA while_loop path (profiled in tools/probe_profile_step.py):

  1. count-adaptive work: the XLA loop runs ceil(GLOBAL max occupancy /
     chunk) iterations for EVERY tile; these kernels bound each tile's
     loop by ITS OWN count (mean occupancy is ~3x below max at bench
     scale) with the same transmittance-saturation early exit;
  2. no HBM round-trips: the XLA backward materializes several
     (C*T, chunk, P) f32 temporaries (205 MB each) per loop step
     (subtract_select_fusion et al., ~35 ms/step of the profile); here
     every intermediate lives in VMEM/vregs.

Layout (TPU tiling): entry attributes are packed (CT, A=9, K) — K on
lanes (multiple of 128), A on sublanes; per-tile pixel arrays are
(P, chunk) — pixels on sublanes so each attribute row (1, chunk)
broadcasts with no relayout; intra-chunk prefix/suffix products run as
(P, chunk) @ (chunk, chunk) triangular matmuls on the MXU (cumprod/cumsum
are not lowered by Mosaic, and the matmul form measured faster anyway —
tools/probe_cum_variants.py). All in-kernel contractions run at
Precision.HIGHEST: at the MXU's default bf16 input rounding, log-space
transmittance sums carry ~0.4% relative error (alpha 0.999 -> log -6.9
rounds by ~0.03), which surfaced as O(0.1-1) rgb mismatches at bench
scale; full-f32 passes restore exact parity with the f32 oracle.

Backward math (identical to rasterize._composite_xla_bwd, which is held
to the autodiff oracle in tests/test_splat.py):
    out = sum_j c_j a_j T_j,  T_j = prod_{l<j} (1 - a_l)
    dL/dc_j = a_j T_j . g
    dL/da_j = T_j (c_j.g) - S_j/(1-a_j) - g_T T_fin/(1-a_j)
with S_j = sum_{l>j} c_l a_l T_l . g; T_j is reconstructed backward from
T_fin by suffix products, walking the SAME chunks the forward processed,
in reverse, from the forward's recorded stopping point.

The public entry `composite_tiles_pallas` matches
rasterize._composite_tiles_xla's signature/semantics exactly (camera axis
folded into tiles; returns rgb (C,H,W,3), alpha (C,H,W)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ("composite_tiles_pallas",)

_NATTR = 9      # mx, my, ca, cb, cc, cr, cg, cb(lue), op
_SIGMA_MAX = 50.0
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.999
# transmittance saturation threshold (same value/reasoning as the XLA
# path's rasterize._TEXIT): keeps the kernels within the 1e-5 parity
# tolerance of the autodiff oracle
_TEXIT = 1e-6

TB = 8          # tiles per program: amortizes grid/DMA overhead


def _tri(ch: int, mode: str):
    """(ch, ch) f32 triangular operators for LANE-dim prefix/suffix sums:
    right-multiplying (P, ch) @ tri. mode 'pref_incl': out[:, i] =
    sum_{j <= i} x[:, j]; 'suf_incl': out[:, i] = sum_{j >= i} x[:, j]."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)   # j (row = input)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)   # i (col = output)
    if mode == "pref_incl":
        return (r <= c).astype(jnp.float32)
    return (r >= c).astype(jnp.float32)


def _chunk_alpha(attr_ref, j: int, i, px, py):
    """Alpha for chunk i of tile j against the tile's pixels.

    attr_ref: (TB, NC, A, 128) VMEM ref — the chunk axis is a LEADING
    dim: dynamic LANE-dim slices (attr[:, ds(i*128, 128)]) were observed
    to compile to wrong results on real TPUs for traced i (parity exact
    in interpret mode and for single-chunk tiles; rgb off by O(1) at
    multi-chunk scale — both the round-3 kernel and the first round-4
    kernel failed identically), while dynamic indexing of a leading dim
    is well-supported. px/py: (P, 1) absolute pixel centers.
    Returns (alpha (P,ch), a (A,ch), dx, dy, expsig, ok, raw)."""
    a = attr_ref[j, i]                           # (A, ch)
    mx = a[0:1]                                  # (1, ch) — broadcasts
    my = a[1:2]
    ca = a[2:3]
    cb = a[3:4]
    cc = a[4:5]
    op = a[8:9]
    dx = px - mx                                 # (P, ch)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    # clip BEFORE exp: exp(-sigma) for large negative sigma overflows to
    # inf in the untaken where-branch and its VJP yields 0 * inf = NaN
    expsig = jnp.exp(-jnp.clip(sigma, 0.0, _SIGMA_MAX))
    raw = op * expsig
    ok = (sigma >= 0.0) & (raw > _ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(raw, _ALPHA_MAX), 0.0)
    return alpha, a, dx, dy, expsig, ok, raw


def _fwd_kernel(counts_ref, attr_ref, rgb_ref, tfin_ref, done_ref,
                *, tile: int, tw: int, th: int, k: int, ch: int):
    p = tile * tile
    t_per_cam = tw * th
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pxl = (pix % tile).astype(jnp.float32)       # (P, 1) tile-local
    pyl = (pix // tile).astype(jnp.float32)
    pref_m = _tri(ch, "pref_incl")

    dones = []
    for j in range(TB):
        g_tid = pl.program_id(0) * TB + j        # global (cam-folded) tile
        t_id = g_tid % t_per_cam
        x0 = (t_id % tw) * tile
        y0 = (t_id // tw) * tile
        px = pxl + x0.astype(jnp.float32) + 0.5
        py = pyl + y0.astype(jnp.float32) + 0.5
        count = counts_ref[g_tid]
        n_chunks = pl.cdiv(count, ch)

        def cond(carry):
            i, _acc, t = carry
            return (i < n_chunks) & (jnp.max(t) > _TEXIT)

        def body(carry):
            i, acc, t = carry                    # acc (P,3), t (P,1)
            alpha, a, _dx, _dy, _es, _ok, _raw = _chunk_alpha(
                attr_ref, j, i, px, py)
            log_om = jnp.log1p(-alpha)           # (P, ch), one_m >= 1e-3
            pref = jnp.dot(log_om, pref_m,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            cum_excl = jnp.exp(pref - log_om)
            wgt = alpha * cum_excl * t           # (P, ch)
            ccol = a[5:8]                        # (3, ch)
            acc = acc + jax.lax.dot_general(
                wgt, ccol, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)     # (P, 3)
            t = t * jnp.exp(pref[:, ch - 1:ch])
            return i + 1, acc, t

        init = (jnp.asarray(0, jnp.int32),
                jnp.zeros((p, 3), jnp.float32),
                jnp.ones((p, 1), jnp.float32))
        done, acc, t = jax.lax.while_loop(cond, body, init)
        rgb_ref[j] = acc.T                       # (3, P)
        tfin_ref[j] = t.T                        # (1, P)
        dones.append(done)
    done_ref[:, :] = jnp.stack(dones).reshape(TB, 1)


def _bwd_kernel(counts_ref, done_ref, attr_ref, tfin_ref, grgb_ref,
                gtfin_ref, gattr_ref, *, tile: int, tw: int, th: int,
                k: int, ch: int):
    p = tile * tile
    t_per_cam = tw * th
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pxl = (pix % tile).astype(jnp.float32)
    pyl = (pix // tile).astype(jnp.float32)
    suf_m = _tri(ch, "suf_incl")

    gattr_ref[...] = jnp.zeros(gattr_ref.shape, gattr_ref.dtype)

    for j in range(TB):
        g_tid = pl.program_id(0) * TB + j
        t_id = g_tid % t_per_cam
        x0 = (t_id % tw) * tile
        y0 = (t_id // tw) * tile
        px = pxl + x0.astype(jnp.float32) + 0.5
        py = pyl + y0.astype(jnp.float32) + 0.5
        done = done_ref[g_tid]
        tfin = tfin_ref[j].T                     # (P, 1)
        g = grgb_ref[j].T                        # (P, 3)
        gtf = gtfin_ref[j].T                     # (P, 1) dL/dT_final
        gt_term = gtf * tfin                     # (P, 1)

        def cond(carry):
            step, _t, _s = carry
            return step < done

        def body(carry):
            step, t_after, s_carry = carry       # t/s: (P, 1)
            i = done - 1 - step                  # walk chunks in reverse
            alpha, a, dx, dy, expsig, ok, raw = _chunk_alpha(
                attr_ref, j, i, px, py)
            one_m = 1.0 - alpha
            # rev_cum[:, i] = prod_{l >= i, same chunk} (1 - alpha_l)
            rev_cum = jnp.exp(jnp.dot(
                jnp.log1p(-alpha), suf_m,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
            t_j = t_after / jnp.maximum(rev_cum, 1e-30)      # (P, ch)
            ccol = a[5:8]                        # (3, ch)
            cdotg = jnp.dot(g, ccol,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            w_j = alpha * t_j
            contrib = w_j * cdotg
            suf_incl = jnp.dot(contrib, suf_m,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            s_j = (suf_incl - contrib) + s_carry
            inv_1m = 1.0 / jnp.maximum(one_m, 1e-3)
            # d trans_fin / d alpha_j = -t_fin / (1 - alpha_j)
            dalpha = t_j * cdotg - s_j * inv_1m - gt_term * inv_1m
            # alpha clipped at ALPHA_MAX or culled: no grad through
            # sigma/opacity there
            interior = ok & (raw < _ALPHA_MAX)
            draw = jnp.where(interior, dalpha, 0.0)
            dsigma = -draw * raw                 # (P, ch)
            ca = a[2:3]
            cb = a[3:4]
            cc = a[4:5]
            d_mx = jnp.sum(dsigma * (-(ca * dx + cb * dy)), axis=0,
                           keepdims=True)        # (1, ch)
            d_my = jnp.sum(dsigma * (-(cc * dy + cb * dx)), axis=0,
                           keepdims=True)
            d_ca = jnp.sum(dsigma * (0.5 * dx * dx), axis=0, keepdims=True)
            d_cb = jnp.sum(dsigma * (dx * dy), axis=0, keepdims=True)
            d_cc = jnp.sum(dsigma * (0.5 * dy * dy), axis=0, keepdims=True)
            d_op = jnp.sum(draw * expsig, axis=0, keepdims=True)
            d_col = jnp.dot(g.T, w_j,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            grad_rows = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_col, d_op], axis=0)
            gattr_ref[j, i] = grad_rows
            t_after = t_after / jnp.maximum(rev_cum[:, 0:1], 1e-30)
            s_carry = s_carry + suf_incl[:, 0:1]
            return (step + 1, t_after, s_carry)

        # count-bounded reverse walk: only the chunks the forward actually
        # processed (`done` per tile) are revisited — a fori to the static
        # max chunk count wasted ~40% of the backward at bench scale
        jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), tfin,
             jnp.zeros((p, 1), jnp.float32)))


def _pack_attr(g_mean, g_conic, g_color, g_op, ch: int):
    """(CT, K, 2/3/3) + (CT, K) -> (CT, NC, A=9, ch) f32 — the K entry
    axis is split into NC leading chunks of ch so the kernels never take
    a dynamic lane-dim slice (see _chunk_alpha)."""
    ct, k = g_op.shape
    nc = k // ch
    rows = [g_mean[..., 0], g_mean[..., 1],
            g_conic[..., 0], g_conic[..., 1], g_conic[..., 2],
            g_color[..., 0], g_color[..., 1], g_color[..., 2],
            g_op]
    return jnp.stack([r.reshape(ct, nc, ch) for r in rows], axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _composite_attr(attr, counts, tile: int, tw: int, th: int, ch: int):
    """attr (CT, A, K) depth-sorted packed entries; counts (CT,) int32.
    Returns (rgb (CT, 3, P), tfin (CT, 1, P))."""
    rgb, tfin, _ = _run_fwd(attr, counts, tile, tw, th, ch)
    return rgb, tfin


def _run_fwd(attr, counts, tile, tw, th, ch):
    ct, nc, a_dim, chs = attr.shape
    k = nc * chs
    p = tile * tile
    kern = functools.partial(_fwd_kernel, tile=tile, tw=tw, th=th, k=k,
                             ch=ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ct // TB,),
        in_specs=[
            pl.BlockSpec((TB, nc, a_dim, chs), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 3, p), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, p), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    rgb, tfin, done = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ct, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((ct, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((ct, 1), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(counts, attr)
    return rgb, tfin, done[:, 0]


def _fwd_rule(attr, counts, tile, tw, th, ch):
    rgb, tfin, done = _run_fwd(attr, counts, tile, tw, th, ch)
    return (rgb, tfin), (attr, counts, tfin, done)


def _bwd_rule(tile, tw, th, ch, res, grads):
    attr, counts, tfin, done = res
    grgb, gtfin = grads
    ct, nc, a_dim, chs = attr.shape
    k = nc * chs
    p = tile * tile
    kern = functools.partial(_bwd_kernel, tile=tile, tw=tw, th=th, k=k,
                             ch=ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # counts, done
        grid=(ct // TB,),
        in_specs=[
            pl.BlockSpec((TB, nc, a_dim, chs),
                         lambda i, c0, c1: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 3, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, p), lambda i, c0, c1: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, nc, a_dim, chs),
                               lambda i, c0, c1: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    gattr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ct, nc, a_dim, chs), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(counts, done, attr, tfin, grgb, gtfin)
    return gattr, None


_composite_attr.defvjp(_fwd_rule, _bwd_rule)


def composite_tiles_pallas(g_mean, g_conic, g_color, g_op, counts, h: int,
                           w: int, tile: int, tw: int, th: int, chunk: int):
    """Fused-kernel compositing over ALL cameras at once (drop-in for
    rasterize._composite_tiles_xla).

    g_* are (C, T, K, ...); cameras fold into the tile axis. Requires
    K % 128 == 0 and (C*T) % TB == 0 — rasterize falls back to the XLA
    path otherwise. Returns rgb (C,H,W,3), alpha (C,H,W)."""
    c, t_total, kk = g_op.shape
    flat = lambda x: x.reshape((c * t_total,) + x.shape[2:])
    attr = _pack_attr(flat(g_mean), flat(g_conic), flat(g_color),
                      flat(g_op), 128)                  # (CT, NC, A, 128)
    # chunk is pinned to 128: lane-dim slices must be 128-aligned, and the
    # K % 128 == 0 precondition guarantees a whole number of chunks. The
    # caller's smaller `chunk` (an XLA-path tuning knob) is ignored here —
    # entries beyond a tile's count carry opacity 0, so chunk size never
    # changes results.
    rgb_t, tfin_t = _composite_attr(attr, counts.reshape(-1).astype(
        jnp.int32), tile, tw, th, 128)
    rgb_t = rgb_t.reshape(c, th, tw, 3, tile, tile)
    rgb = rgb_t.transpose(0, 1, 4, 2, 5, 3).reshape(
        c, th * tile, tw * tile, 3)[:, :h, :w]
    a_t = (1.0 - tfin_t).reshape(c, th, tw, tile, tile)
    alpha = a_t.transpose(0, 1, 3, 2, 4).reshape(
        c, th * tile, tw * tile)[:, :h, :w]
    return rgb, alpha
