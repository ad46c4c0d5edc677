"""Mosaic gather probe, round 2 — block-shape-conformant variants."""
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


N = 50_048
A = 16
T = 1568
K = 1024
TB = 8

rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N, A)).astype(np.float32))
gidx = jnp.asarray(rng.integers(0, N, size=(T, K)).astype(np.int32))


def report(name, fn, *a):
    try:
        dt, out = timeit(fn, *a)
        print(f"{name:32s} {dt*1e3:8.2f} ms   out={out.shape} "
              f"sum={float(jnp.sum(out)):.1f}", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:400]
        print(f"{name:32s} FAILED: {msg}", flush=True)
        return None


@jax.jit
def xla_gather(table, gidx):
    return table[gidx.reshape(-1)].reshape(T, K, A)


ref = report("xla_gather", xla_gather, table, gidx)


# ---- V5: TB tiles/program, loop of per-row takes --------------------------
def v5_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]
    for r in range(TB):
        out_ref[r] = jnp.take(tab, idx_ref[r], axis=0)


@jax.jit
def v5(table, gidx):
    return pl.pallas_call(
        v5_kernel,
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


out = report("v5 take per-row TB=8", v5, table, gidx)
if out is not None and ref is not None:
    print("  parity:", float(jnp.max(jnp.abs(out - ref))))

# ---- V6: flat 2D out (TB*K, A), flat idx via reshape ----------------------
def v6_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:].reshape(TB * K)
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)


@jax.jit
def v6(table, gidx):
    return pl.pallas_call(
        v6_kernel,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((N, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB * K, A), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * K, A), jnp.float32),
    )(table, gidx)


out = report("v6 take flat TB*K", v6, table, gidx)
if out is not None and ref is not None:
    print("  parity:", float(jnp.max(jnp.abs(out.reshape(T, K, A) - ref))))
