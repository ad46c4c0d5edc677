"""Feasibility probe: vectorized gather from a VMEM-resident table inside
a Pallas TPU kernel.

The rasterizer's per-step hot cost is three 1.6M-row XLA gathers that each
pay a full (8,128) f32 tile (4 KB) of physical HBM read per 36 B logical
row (profiled tools/probe_profile_step.py). If Mosaic can gather rows from
a VMEM table with a dynamic index vector, the whole gather+composite can
fuse into one kernel whose HBM traffic is the index stream + outputs.

Tries several formulations at bench-like shapes (N=50k table, K=1024
indices per tile, 9 attrs) and prints which lower + their speed.
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, iters=20):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


N = 50_048          # table rows (padded to sublane multiple)
A = 16              # attr columns padded (9 -> 16 lanes... still sub-128)
T = 1568            # tiles
K = 1024            # slots per tile

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N, A)).astype(np.float32))
# lane-major table: (A, N) so gathers run along lanes
table_t = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))
gidx = jnp.asarray(rng.integers(0, N, size=(T, K)).astype(np.int32))


def report(name, fn, *a):
    try:
        dt, out = timeit(fn, *a)
        print(f"{name:32s} {dt*1e3:8.2f} ms   out={out.shape} "
              f"sum={float(jnp.sum(out)):.1f}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:180]
        print(f"{name:32s} FAILED: {msg}", flush=True)
        return None


# ---- baseline: XLA gather (T,K) rows from (N, A) --------------------------
@jax.jit
def xla_gather(table, gidx):
    return table[gidx.reshape(-1)].reshape(T, K, A)


report("xla_gather (N,A) rows", xla_gather, table, gidx)


# ---- V1: whole table in VMEM, per-tile program, jnp.take ------------------
def v1_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[0]                       # (K,)
    out_ref[0] = jnp.take(tab_ref[:], idx, axis=0)   # (K, A)


@jax.jit
def v1(table, gidx):
    return pl.pallas_call(
        v1_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((N, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, A), jnp.float32),
    )(table, gidx)


report("pallas take rows (N,A)", v1, table, gidx)


# ---- V2: lane-major table (A, N), take along axis 1 -----------------------
def v2_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[0]                       # (K,)
    out_ref[0] = jnp.take(tab_ref[:], idx, axis=1)   # (A, K)


@jax.jit
def v2(table_t, gidx):
    return pl.pallas_call(
        v2_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((A, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, A, K), jnp.float32),
    )(table_t, gidx)


report("pallas take lanes (A,N)", v2, table_t, gidx)


# ---- V3: ref vector indexing tab_ref[idx] ---------------------------------
def v3_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[0]
    out_ref[0] = tab_ref[idx]


@jax.jit
def v3(table, gidx):
    return pl.pallas_call(
        v3_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((N, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, A), jnp.float32),
    )(table, gidx)


report("pallas ref[idx] rows", v3, table, gidx)

# ---- V4: multi-tile block program (8 tiles per program) -------------------
TB = 8


def v4_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:].reshape(TB * K)
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0).reshape(TB, K, A)


@jax.jit
def v4(table, gidx):
    return pl.pallas_call(
        v4_kernel,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((N, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, K, A), jnp.float32),
    )(table, gidx)


report("pallas take rows TB=8", v4, table, gidx)

# correctness spot-check of whichever ran
try:
    ref = np.asarray(xla_gather(table, gidx))
    got = np.asarray(v1(table, gidx))
    print("v1 parity:", np.abs(ref - got).max())
except Exception as e:
    print("v1 parity skipped:", repr(e)[:100])
