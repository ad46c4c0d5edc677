"""ViT encoder / cross-attention decoder with 2D RoPE (flax.linen).

TPU-native rebuild of the CroCo backbone consumed by the reference
(call-sites: reference starster/__init__.py:3, main.py:46; SURVEY §2b row
"CroCo ViT backbone"): ViT encoder over patch-16 tokens, then the CroCo
*interleaved* two-stream decoder — two stacks of decoder blocks
(`dec_blocks` / `dec_blocks2`, one per view role) run in lockstep, block i
of each stream cross-attending to the OTHER stream's block i-1 output.
2D rotary position embedding on every self/cross attention's q/k.

Checkpoint faithfulness (tests/test_torch_parity.py holds this to float
tolerance against a torch reimplementation of the croco/dust3r trunk):
  - one shared `decoder_embed` projects both encoder streams;
  - one shared `dec_norm` normalizes both final decoder states;
  - every decoder block LayerNorms its cross-attention memory (`norm_y`,
    croco norm_mem=True);
  - LayerNorm eps 1e-5 (torch default), exact (erf) GELU.

Design notes (TPU-first):
  - all matmuls batched over (2*pairs) images so the MXU sees large GEMMs;
  - activations in bfloat16 (param dtype float32) by default;
  - no dynamic shapes: token count fixed per resolution bucket;
  - RoPE is pure jnp (ops/rope.py), fused by XLA into the attention matmuls;
  - the two decoder streams at step i are independent given step i-1, so
    XLA overlaps them freely.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import sdpa
from ..ops.rope import apply_rope_2d, rope_2d_freqs

__all__ = ("PatchEmbed", "Mlp", "EncoderBlock", "DecoderBlock", "Encoder",
           "InterleavedDecoder", "patch_positions")

# torch nn.LayerNorm default eps (croco uses the default)
_LN = functools.partial(nn.LayerNorm, epsilon=1e-5)


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
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is erf-exact
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
            _LN(dtype=self.dtype, name="norm1")(x), rope)
        x = x + Mlp(self.dim, self.mlp_ratio, self.dtype, name="mlp")(
            _LN(dtype=self.dtype, name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """croco DecoderBlock: pre-LN self-attention, cross-attention to the
    other stream's tokens (memory LayerNormed by `norm_y`, norm_mem=True),
    pre-LN MLP."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, rope_x, rope_y):
        """x: this stream's tokens; y: other stream's previous-layer tokens."""
        x = x + Attention(self.dim, self.heads, self.dtype, name="self_attn")(
            _LN(dtype=self.dtype, name="norm1")(x), rope_x)
        y_ = _LN(dtype=self.dtype, name="norm_y")(y)
        x = x + CrossAttention(self.dim, self.heads, self.dtype,
                               name="cross_attn")(
            _LN(dtype=self.dtype, name="norm2")(x), y_, rope_x, rope_y)
        x = x + Mlp(self.dim, self.mlp_ratio, self.dtype, name="mlp")(
            _LN(dtype=self.dtype, name="norm3")(x))
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
        return _LN(dtype=self.dtype, name="norm")(x)


class InterleavedDecoder(nn.Module):
    """The CroCo/DUSt3R two-stream decoder (reference topology, call-site
    main.py:46 `BaseDecoder`): both encoder outputs are projected by ONE
    shared `decoder_embed`; then two stacks of decoder blocks (`block{i}`
    maps the checkpoint's `dec_blocks.{i}`, `block2_{i}` maps
    `dec_blocks2.{i}`) run interleaved — at step i each stream
    cross-attends to the *other stream's step i-1 output*. One shared final
    LayerNorm (`dec_norm`) normalizes both last states.

    Returns (states1, states2): per stream, the embedded tokens followed by
    every block output, with the last entry normalized — states{v}[i] is
    block i-1's output, matching the dust3r DPT hook indexing
    [enc, dec_0, ..., dec_{L-1}] once the caller substitutes the encoder
    output for index 0.
    """

    depth: int
    dim: int
    heads: int
    enc_dim: int
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, f1, f2, pos1, pos2):
        """f1, f2: (B, T, enc_dim) encoder outputs; pos*: (1, T, 2)."""
        hd = self.dim // self.heads
        embed = nn.Dense(self.dim, dtype=self.dtype, name="embed")
        x1, x2 = embed(f1), embed(f2)
        rope1 = rope_2d_freqs(pos1, hd, self.rope_base)
        rope2 = rope_2d_freqs(pos2, hd, self.rope_base)
        states1, states2 = [x1], [x2]
        for i in range(self.depth):
            blk1 = DecoderBlock(self.dim, self.heads, self.mlp_ratio,
                                self.dtype, name=f"block{i}")
            blk2 = DecoderBlock(self.dim, self.heads, self.mlp_ratio,
                                self.dtype, name=f"block2_{i}")
            # both blocks read the PREVIOUS pair (x1, x2) — interleaved
            n1 = blk1(x1, x2, rope1, rope2)
            n2 = blk2(x2, x1, rope2, rope1)
            x1, x2 = n1, n2
            states1.append(x1)
            states2.append(x2)
        norm = _LN(dtype=self.dtype, name="norm")
        states1[-1] = norm(states1[-1])
        states2[-1] = norm(states2[-1])
        return states1, states2
