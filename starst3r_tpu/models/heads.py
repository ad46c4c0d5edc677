"""Prediction heads: DPT pointmap head + MLP local-feature (descriptor) head.

Behavioral spec (SURVEY §2b row "AsymmetricMASt3R heads", call-site evidence
reference main.py:46 model id "...catmlpdpt...", reconstruct.py:81
`desc_conf`): per view the network regresses
  - a dense 3D pointmap X (H, W, 3) in view-1's frame, via a DPT head over
    multi-layer decoder tokens,
  - a pixelwise confidence C (H, W) with C >= 1 (conf = 1 + exp(c), so the
    reference thresholds conf_thres=1.5 / matching_conf_thr=5 keep their
    meaning),
  - a dense local descriptor map D (H, W, desc_dim), L2-normalized, plus a
    descriptor confidence — produced by an MLP over [encoder || decoder]
    tokens with pixel-shuffle to full resolution (the "catmlpdpt" pattern).

Pointmap parameterization ("exp" mode): raw u -> u / |u| * expm1(|u|), which
maps R^3 onto all of R^3 with better-conditioned gradients near zero.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ("DPTHead", "DescriptorHead", "postprocess_pointmap")


def postprocess_pointmap(raw: jnp.ndarray, mode: str = "exp"):
    """raw: (..., 4) -> (pts3d (..., 3), conf (...,))."""
    xyz = raw[..., :3].astype(jnp.float32)
    c = raw[..., 3].astype(jnp.float32)
    if mode == "exp":
        d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pts = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    elif mode == "linear":
        pts = xyz
    else:
        raise ValueError(mode)
    conf = 1.0 + jnp.exp(jnp.clip(c, -10.0, 10.0))
    return pts, conf


class _FusionBlock(nn.Module):
    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + skip
        r = nn.relu(x)
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(r)
        x = x + r
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")


class DPTHead(nn.Module):
    """Dense Prediction Transformer head over 4 decoder hook states.

    Reassembles token states into pyramid feature maps (x4, x2, x1, x0.5 of
    the patch grid), fuses coarse->fine with residual conv blocks, and
    predicts ``out_ch`` channels at full image resolution.
    """

    out_ch: int = 4
    feat_dim: int = 128
    patch_size: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, states: Sequence[jnp.ndarray], hp: int, wp: int,
                 img_h: int, img_w: int) -> jnp.ndarray:
        assert len(states) == 4
        b = states[0].shape[0]
        fd = self.feat_dim
        # reassemble: project + reshape to patch grid + rescale
        scales = (4, 2, 1, 0.5)
        feats = []
        for i, (s, k) in enumerate(zip(states, scales)):
            f = nn.Dense(fd, dtype=self.dtype, name=f"proj{i}")(s)
            f = f.reshape(b, hp, wp, fd)
            nh, nw = int(hp * k), int(wp * k)
            if (nh, nw) != (hp, wp):
                f = jax.image.resize(f, (b, nh, nw, fd), "bilinear")
            f = nn.Conv(fd, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"rn{i}")(f)
            feats.append(f)
        # fusion, deepest (smallest) first
        x = _FusionBlock(fd, self.dtype, name="fuse3")(feats[3])
        x = _FusionBlock(fd, self.dtype, name="fuse2")(x, feats[2])
        x = _FusionBlock(fd, self.dtype, name="fuse1")(x, feats[1])
        x = _FusionBlock(fd, self.dtype, name="fuse0")(x, feats[0])
        # x is now at 8x patch grid = img/2 resolution
        x = nn.Conv(fd // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head1")(x)
        x = jax.image.resize(x, (b, img_h, img_w, fd // 2), "bilinear")
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), dtype=jnp.float32, name="head3")(x)
        return x  # (B, H, W, out_ch) float32


class DescriptorHead(nn.Module):
    """MLP + pixel-shuffle local-feature head ("catmlpdpt" analog).

    Input: concat of encoder tokens and final decoder tokens; output per
    pixel: desc_dim channels (L2-normalized) + 1 confidence channel.
    """

    desc_dim: int = 24
    patch_size: int = 16
    hidden_ratio: float = 2.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, enc_tokens, dec_tokens, hp: int, wp: int):
        x = jnp.concatenate([enc_tokens, dec_tokens], axis=-1)
        b, t, _ = x.shape
        p = self.patch_size
        out_ch = self.desc_dim + 1
        hidden = int(out_ch * p * p * self.hidden_ratio)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(out_ch * p * p, dtype=jnp.float32, name="fc2")(x)
        # pixel shuffle: (B, T, p*p*C) -> (B, H, W, C)
        x = x.reshape(b, hp, wp, p, p, out_ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * p, wp * p, out_ch)
        desc = x[..., : self.desc_dim]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        desc_conf = 1.0 + jnp.exp(jnp.clip(x[..., -1], -10.0, 10.0))
        return desc, desc_conf
