"""TPU probe: fastest way to do the rasterizer gather-backward reduction.

The op: cotangent rows g2 (TK, 9) must be summed per owning Gaussian:
d_packed (N, 9), where each Gaussian owns <= E entries whose positions are
known from the forward sort. Variants:

  V1 two row-gathers (current _gather_packed_bwd): (L,) from (TK,9) then
     (L,) regroup, sum E
  V2 ONE composed row-gather: precomposed bw_idx (N*E,) into (TK+1, 9)
  V4 per-column scalar gathers: 9 separate (TK+1,) arrays
  V5 payload sort: lax.sort((gidx, v0..v8)) then reshape(N,E,9).sum(1)
  V6 scatter-add segment_sum baseline of (TK,9) by gidx
  V7 V2 with bf16 rows
All at bench scale: per-camera L = 800k, TK = 200704, N = 50k, E = 16,
vmapped over 8 cameras.
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

C = 8
N = 50_000
E = 16
T = 196
K = 1024
TK = T * K
L = N * E

rng = np.random.default_rng(0)
# random but realistic index structure per camera
G2 = jnp.asarray(rng.normal(size=(C, TK, 9)).astype(np.float32))
LIN = jnp.asarray(rng.integers(0, TK, size=(C, L)).astype(np.int32))
BYG = jnp.asarray(
    np.stack([rng.permutation(L) for _ in range(C)]).astype(np.int32))
BWIDX = jnp.asarray(rng.integers(0, TK, size=(C, N * E)).astype(np.int32))
GIDX = jnp.asarray(rng.integers(0, N, size=(C, TK)).astype(np.int32))
G2_BF = G2.astype(jnp.bfloat16)


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


def v1(eps):
    def per_cam(g2, lin, byg):
        gflat = g2[lin]                               # (L, 9)
        d = gflat[byg].reshape(N, E, 9).sum(axis=1)
        return jnp.sum(d)
    return jnp.sum(jax.vmap(per_cam)(G2 + eps, LIN, BYG))


def v2(eps):
    def per_cam(g2, bw):
        d = g2[bw].reshape(N, E, 9).sum(axis=1)
        return jnp.sum(d)
    return jnp.sum(jax.vmap(per_cam)(G2 + eps, BWIDX))


def v4(eps):
    def per_cam(g2, bw):
        tot = 0.0
        for c in range(9):
            col = g2[:, c]                            # (TK,)
            tot = tot + jnp.sum(col[bw].reshape(N, E).sum(axis=1))
        return tot
    return jnp.sum(jax.vmap(per_cam)(G2 + eps, BWIDX))


def v5(eps):
    def per_cam(g2, gidx):
        # sort payload rows by gaussian key (gidx expanded to TK entries;
        # pad to N*E? here TK < N*E so pad keys with N sentinel)
        pad = N * E - TK
        keys = jnp.concatenate([gidx, jnp.full((pad,), N, jnp.int32)])
        vals = [jnp.concatenate([g2[:, c], jnp.zeros((pad,), jnp.float32)])
                for c in range(9)]
        out = jax.lax.sort((keys, *vals), num_keys=1)
        # after sorting by gaussian, each gaussian's entries are contiguous
        # but variable-count; here we only benchmark the sort+reduce cost
        s = sum(jnp.sum(v.reshape(N, E)) for v in out[1:])
        return s
    return jnp.sum(jax.vmap(per_cam)(G2 + eps, GIDX))


def v6(eps):
    def per_cam(g2, gidx):
        d = jax.ops.segment_sum(g2, gidx, num_segments=N)
        return jnp.sum(d)
    return jnp.sum(jax.vmap(per_cam)(G2 + eps, GIDX))


def v7(eps):
    def per_cam(g2, bw):
        d = g2[bw].reshape(N, E, 9).sum(axis=1)
        return jnp.sum(d.astype(jnp.float32))
    return jnp.sum(jax.vmap(per_cam)(G2_BF + eps.astype(jnp.bfloat16),
                                     BWIDX))


timeit("V2 one composed row-gather", v2)
timeit("V4 9 scalar-column gathers", v4)
timeit("V5 payload sort by gaussian", v5)
timeit("V6 segment_sum scatter", v6)
timeit("V7 composed gather bf16", v7)
log("done")
