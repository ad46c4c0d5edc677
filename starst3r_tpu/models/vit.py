"""ViT encoder / cross-attention decoder with 2D RoPE (flax.linen).

TPU-native rebuild of the CroCo backbone consumed by the reference
(call-sites: reference starster/__init__.py:3, main.py:46; SURVEY §2b row
"CroCo ViT backbone"): ViT encoder over patch-16 tokens, decoder blocks with
self-attention + cross-attention to the *other* view's encoder tokens, 2D
rotary position embedding on every self/cross attention's q/k.

Design notes (TPU-first):
  - all matmuls batched over (2*pairs) images so the MXU sees large GEMMs;
  - activations in bfloat16 (param dtype float32) by default;
  - no dynamic shapes: token count fixed per resolution bucket;
  - RoPE is pure jnp (ops/rope.py), fused by XLA into the attention matmuls.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import sdpa
from ..ops.rope import apply_rope_2d, rope_2d_freqs

__all__ = ("PatchEmbed", "Mlp", "EncoderBlock", "DecoderBlock", "Encoder",
           "Decoder", "patch_positions")


def patch_positions(h_patches: int, w_patches: int) -> jnp.ndarray:
    """(T, 2) integer (y, x) coordinates of the patch grid in raster order."""
    ys = jnp.repeat(jnp.arange(h_patches), w_patches)
    xs = jnp.tile(jnp.arange(w_patches), h_patches)
    return jnp.stack([ys, xs], axis=-1)


class PatchEmbed(nn.Module):
    dim: int
    patch_size: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: (B, H, W, 3) -> tokens (B, T, dim)."""
        x = nn.Conv(self.dim, kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="proj")(img)
        b, hp, wp, c = x.shape
        return x.reshape(b, hp * wp, c)


class Mlp(nn.Module):
    dim: int
    ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ratio)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]]):
        b, t, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if rope is not None:
            q, k = apply_rope_2d(q, k, *rope)
        out = sdpa(q, k, v)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(b, t, self.dim))


class CrossAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, rope_q, rope_k):
        """x: queries (B, Tq, dim); y: keys/values source (B, Tk, dim)."""
        b, tq, _ = x.shape
        tk = y.shape[1]
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(y)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(y)
        q = q.reshape(b, tq, self.heads, hd)
        k = k.reshape(b, tk, self.heads, hd)
        v = v.reshape(b, tk, self.heads, hd)
        if rope_q is not None:
            # rotate q and k independently with their own positions
            q, _ = apply_rope_2d(q, q, *rope_q)
            k, _ = apply_rope_2d(k, k, *rope_k)
        out = sdpa(q, k, v)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(b, tq, self.dim))


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope):
        x = x + Attention(self.dim, self.heads, self.dtype, name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), rope)
        x = x + Mlp(self.dim, self.mlp_ratio, self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, rope_x, rope_y):
        """x: this view's tokens; y: other view's (projected) tokens."""
        x = x + Attention(self.dim, self.heads, self.dtype, name="self_attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), rope_x)
        x = x + CrossAttention(self.dim, self.heads, self.dtype,
                               name="cross_attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), y, rope_x, rope_y)
        x = x + Mlp(self.dim, self.mlp_ratio, self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class Encoder(nn.Module):
    depth: int
    dim: int
    heads: int
    patch_size: int = 16
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: (B, H, W, 3) -> (B, T, dim)."""
        b, h, w, _ = img.shape
        hp, wp = h // self.patch_size, w // self.patch_size
        x = PatchEmbed(self.dim, self.patch_size, self.dtype,
                       name="patch_embed")(img)
        pos = patch_positions(hp, wp)[None]  # (1, T, 2)
        rope = rope_2d_freqs(pos, self.dim // self.heads, self.rope_base)
        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.heads, self.mlp_ratio, self.dtype,
                             name=f"block{i}")(x, rope)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class Decoder(nn.Module):
    """Cross-attention decoder for one view. Returns all intermediate states
    (for DPT hooks) plus the final normalized tokens."""

    depth: int
    dim: int
    heads: int
    enc_dim: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat_self, feat_other, pos_self, pos_other):
        """feat_*: (B, T, enc_dim) encoder outputs; pos_*: (1, T, 2)."""
        hd = self.dim // self.heads
        x = nn.Dense(self.dim, dtype=self.dtype, name="embed")(feat_self)
        y = nn.Dense(self.dim, dtype=self.dtype, name="embed_other")(feat_other)
        rope_x = rope_2d_freqs(pos_self, hd, self.rope_base)
        rope_y = rope_2d_freqs(pos_other, hd, self.rope_base)
        states = [x]
        for i in range(self.depth):
            x = DecoderBlock(self.dim, self.heads, self.mlp_ratio, self.dtype,
                             name=f"block{i}")(x, y, rope_x, rope_y)
            states.append(x)
        states[-1] = nn.LayerNorm(dtype=self.dtype, name="norm")(states[-1])
        return states
