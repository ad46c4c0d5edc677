"""Honest device timing on the axon TPU tunnel.

`jax.block_until_ready` on this platform was observed to return early
(~1000x optimistic per-step times), so wall-clocking a chain of N
data-dependent steps between two real host transfers (`jax.device_get`
of a scalar) is the only trustworthy measure: the dependency chain forces
the device to complete all N steps before the final scalar can be
materialized on the host.
"""

from __future__ import annotations

import time
from typing import Callable


def chain_time(step: Callable, n: int = 10, warmup: int = 2) -> float:
    """Average seconds per iteration of `step`.

    `step()` must advance device state (its output feeding the next call's
    input) and return a SMALL array (scalar preferred) whose value depends
    on the full computation. Returns seconds/iter measured between two
    device_get syncs around n chained iterations.
    """
    import jax

    out = None
    for _ in range(warmup):
        out = step()
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = step()
    jax.device_get(out)
    return (time.perf_counter() - t0) / n
