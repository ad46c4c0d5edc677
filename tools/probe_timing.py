"""Timing-methodology probe (VERDICT r3 #10).

Three ways to time the same device work on the axon TPU tunnel:

  A. `block_until_ready` on a single dispatch (classic).
  B. carry-chain: K data-dependent dispatches between two `device_get`s
     (bench.py `_timeit`) — includes per-dispatch host/tunnel overhead if
     the host cannot enqueue ahead of the device.
  C. `lax.scan` of K data-dependent iterations inside ONE dispatch —
     pure device time per iteration, no per-dispatch overhead.

Ground truth: a bf16 matmul with known FLOPs. On a v5e (197 Tbf16FLOP/s
peak) a 4096^3 matmul is 137 GFLOP ~ 0.7 ms at speed-of-light; any
measurement far outside [0.7 ms, 5 ms] is methodology error.

Run: python tools/probe_timing.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 4096
    flops = 2 * n ** 3
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm(x):
        return (x @ b)

    # warmup/compile
    out = mm(a)
    jax.block_until_ready(out)

    # A: block_until_ready, 10 independent dispatches
    t0 = time.perf_counter()
    for _ in range(10):
        out = mm(a)
    jax.block_until_ready(out)
    dt_a = (time.perf_counter() - t0) / 10

    # B: carry chain, 10 data-dependent dispatches
    x = a
    t0 = time.perf_counter()
    for _ in range(10):
        x = mm(x)
    jax.block_until_ready(x)
    dt_b = (time.perf_counter() - t0) / 10

    # C: scan of 10 chained matmuls in ONE dispatch
    @jax.jit
    def mm_scan(x):
        def body(c, _):
            return mm(c), ()
        c, _ = jax.lax.scan(body, x, None, length=10)
        return c

    jax.block_until_ready(mm_scan(a))
    t0 = time.perf_counter()
    y = mm_scan(a)
    jax.block_until_ready(y)
    dt_c = (time.perf_counter() - t0) / 10

    # D: empty-ish dispatch round trip (tiny kernel, chained)
    @jax.jit
    def tiny(s):
        return s + 1.0

    s = jnp.asarray(0.0)
    jax.block_until_ready(tiny(s))
    t0 = time.perf_counter()
    for _ in range(20):
        s = tiny(s)
    jax.block_until_ready(s)
    dt_d = (time.perf_counter() - t0) / 20

    peak = 197e12
    print(f"matmul {n}^3 = {flops/1e9:.0f} GFLOP, v5e peak -> "
          f"{flops/peak*1e3:.2f} ms at speed-of-light")
    print(f"A block_until_ready x10 indep : {dt_a*1e3:8.3f} ms/iter "
          f"(MFU {flops/dt_a/peak:.2f})")
    print(f"B carry-chain x10 dispatches  : {dt_b*1e3:8.3f} ms/iter "
          f"(MFU {flops/dt_b/peak:.2f})")
    print(f"C lax.scan x10 in one dispatch: {dt_c*1e3:8.3f} ms/iter "
          f"(MFU {flops/dt_c/peak:.2f})")
    print(f"D tiny chained dispatch       : {dt_d*1e3:8.3f} ms/dispatch "
          f"(per-dispatch overhead floor)")


if __name__ == "__main__":
    sys.exit(main())
