"""Scaled-dot-product attention wrapper.

All FLOPs here land on the MXU. Default path is XLA's fused SDPA
(`jax.nn.dot_product_attention`) which compiles to flash-style kernels on
TPU; an explicit einsum fallback exists for debugging/interpretability.
Tokens-per-image at 512px/patch16 is 1024 — small enough that XLA's fusion
is at speed-of-light; a Pallas flash kernel only pays off for much longer
sequences (kept as an upgrade hook via ``impl='pallas'`` later).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ("sdpa",)


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         impl: str = "xla") -> jnp.ndarray:
    """q: (B, Tq, H, D), k/v: (B, Tk, H, D) -> (B, Tq, H, D)."""
    if impl == "einsum":
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return jax.nn.dot_product_attention(q, k, v)
