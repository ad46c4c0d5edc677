"""2D rotary position embedding (RoPE) for ViT patch tokens.

TPU-native replacement for the reference's `curope` CUDA extension
(call-site: reference starster/__init__.py:3 → croco RoPE2D; SURVEY §2b row
"CroCo ViT backbone"). On TPU this is pure jnp — XLA fuses the rotation into
the surrounding matmuls, so no custom kernel is needed for parity; the fused
RoPE+attention Pallas kernel is a later speed-of-light target.

Convention (croco RoPE2D): head dim D is split in two halves; the first half
encodes the y coordinate, the second half the x coordinate. Within each half
the standard 1D RoPE rotation is applied over D/4 frequency pairs with base
``base`` (croco default 100.0). Pairing is interleaved (even, odd) channels
— matching croco's `(x1, x2) = x[..., 0::2], x[..., 1::2]` layout.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = ("rope_2d_freqs", "apply_rope_2d")


@functools.lru_cache(maxsize=32)
def _inv_freq(quarter_dim: int, base: float):
    import numpy as np
    return jnp.asarray(
        1.0 / (base ** (np.arange(0, quarter_dim, dtype=np.float32) / quarter_dim)))


def rope_2d_freqs(positions: jnp.ndarray, head_dim: int, base: float = 100.0):
    """positions: (..., T, 2) int/float (y, x) patch coordinates.

    Returns (cos, sin) each of shape (..., T, head_dim) ready to combine with
    q/k. head_dim must be divisible by 4.
    """
    assert head_dim % 4 == 0, head_dim
    quarter = head_dim // 4
    inv = _inv_freq(quarter, base)  # (quarter,)
    y = positions[..., 0:1].astype(jnp.float32) * inv  # (..., T, quarter)
    x = positions[..., 1:2].astype(jnp.float32) * inv
    # each angle covers an (even, odd) channel pair -> repeat 2x interleaved
    ang = jnp.concatenate([y, x], axis=-1)              # (..., T, half)
    cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)          # (..., T, head_dim)
    sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)
    return cos, sin


def _rotate_half_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope_2d(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray):
    """q, k: (..., T, H, D) with cos/sin (..., T, D) broadcast over heads."""
    cos_b = cos[..., :, None, :]
    sin_b = sin[..., :, None, :]
    q_out = q * cos_b + _rotate_half_pairs(q) * sin_b
    k_out = k * cos_b + _rotate_half_pairs(k) * sin_b
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
