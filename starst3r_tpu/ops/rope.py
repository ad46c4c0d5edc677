"""2D rotary position embedding (RoPE) for ViT patch tokens.

TPU-native replacement for the reference's `curope` CUDA extension
(call-site: reference starster/__init__.py:3 -> croco RoPE2D; SURVEY §2b row
"CroCo ViT backbone"). On TPU this is pure jnp — XLA fuses the rotation into
the surrounding matmuls, so no custom kernel is needed for parity; the fused
RoPE+attention Pallas kernel is a later speed-of-light target.

Convention — CHECKPOINT-FAITHFUL to croco RoPE2D (verified against a torch
reimplementation in tests/test_torch_parity.py):
  - head dim D splits into two halves: the first D/2 channels encode the
    y coordinate, the last D/2 the x coordinate;
  - within each half, 1D RoPE uses the *concatenated-halves* ("rotate_half",
    GPT-NeoX style) pairing: channel c pairs with channel c + D/4, i.e.
    angles = cat(freqs, freqs) over the half and
    rotate(t) = cat(-t[D/4:], t[:D/4]);
  - frequencies inv_freq[j] = base ** (-j / (D/4)), j in [0, D/4), with
    croco's default base 100.0.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = ("rope_2d_freqs", "apply_rope_2d")


@functools.lru_cache(maxsize=32)
def _inv_freq(quarter_dim: int, base: float):
    import numpy as np
    return jnp.asarray(
        1.0 / (base ** (np.arange(0, quarter_dim, dtype=np.float32)
                        / quarter_dim)))


def rope_2d_freqs(positions: jnp.ndarray, head_dim: int, base: float = 100.0):
    """positions: (..., T, 2) int/float (y, x) patch coordinates.

    Returns (cos, sin) each of shape (..., T, head_dim) ready to combine with
    q/k. head_dim must be divisible by 4.
    """
    assert head_dim % 4 == 0, head_dim
    quarter = head_dim // 4
    inv = _inv_freq(quarter, base)  # (quarter,)
    ay = positions[..., 0:1].astype(jnp.float32) * inv  # (..., T, quarter)
    ax = positions[..., 1:2].astype(jnp.float32) * inv
    # croco layout: angles for [y-half, y-half, x-half, x-half] quarters
    ang = jnp.concatenate([ay, ay, ax, ax], axis=-1)    # (..., T, head_dim)
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """croco rotate_half applied independently to the y-half and x-half:
    quarters (a, b, c, d) -> (-b, a, -d, c)."""
    q = x.shape[-1] // 4
    a, b, c, d = (x[..., :q], x[..., q:2 * q],
                  x[..., 2 * q:3 * q], x[..., 3 * q:])
    return jnp.concatenate([-b, a, -d, c], axis=-1)


def apply_rope_2d(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                  sin: jnp.ndarray):
    """q, k: (..., T, H, D) with cos/sin (..., T, D) broadcast over heads."""
    cos_b = cos[..., :, None, :]
    sin_b = sin[..., :, None, :]
    q_out = q * cos_b + _rotate_half(q) * sin_b
    k_out = k * cos_b + _rotate_half(k) * sin_b
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
