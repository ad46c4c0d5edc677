"""Device-level tracing hooks (SURVEY §5 "Tracing / profiling" row).

Wraps `jax.profiler` so any pipeline phase can be traced to a TensorBoard-
compatible trace directory. Two activation paths:

  - explicit: ``with trace_if("ga", trace_dir): ...``
  - ambient:  set ``STARST3R_TRACE_DIR``; every `trace_if` block traces
    into a subdirectory named after its label.

Traces are the ground truth for performance work on TPU — wall-clock
timers around jit boundaries (utils.metrics.Timer) measure dispatch +
device; the profiler separates compilation, host overhead, and per-op
device time.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

__all__ = ("trace_if", "trace_dir_from_env")

_ENV = "STARST3R_TRACE_DIR"


def trace_dir_from_env() -> Optional[str]:
    return os.environ.get(_ENV) or None


@contextlib.contextmanager
def trace_if(label: str, trace_dir: Optional[str] = None):
    """Trace the enclosed block with jax.profiler when a trace dir is
    given (argument wins over the STARST3R_TRACE_DIR env). No-op and
    zero-overhead otherwise."""
    base = trace_dir or trace_dir_from_env()
    if not base:
        yield
        return
    import jax

    path = os.path.join(base, label)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
