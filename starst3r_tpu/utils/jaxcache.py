"""Persistent XLA compilation cache.

TPU compile times for the big jitted steps (rasterizer fwd+bwd, ViT
inference) run to minutes; a disk cache makes every process after the first
start instantly. Called by bench.py, the CLI, and the test conftest.
Opt out with STARST3R_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("STARST3R_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return
    _enabled = True
