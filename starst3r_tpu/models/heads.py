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

WEIGHT ISOMORPHISM: module structure and shapes mirror the public MASt3R
checkpoint layout (mast3r catmlp_dpt_head "Cat_MLP_LocalFeatures_DPT_Pts3d"
over croco's DPTOutputAdapter), so `io/torch_convert.py` maps every head
tensor:
  - reassemble stage i: 1x1 projection (`act{i}_proj`) then x4 / x2 /
    identity / stride-2-conv rescale. The transposed convolutions of the
    torch head (kernel==stride, no overlap) are implemented as Dense +
    pixel-shuffle — mathematically identical and MXU-friendly
    (`act0_up`, `act1_up`);
  - `layer{1..4}_rn` 3x3 no-bias convs onto the fusion width;
  - `refinenet{4..1}` FeatureFusionBlocks, each with two residual conv
    units (conv1/conv2 with ReLU pre-activations) and a 1x1 `out_conv`;
  - `head0/head2/head4` output convs (named by their torch Sequential
    indices 0/2/4).
Fidelity note: torch upsamples with align_corners=True; we reproduce that
exactly via static interpolation matrices applied as two small matmuls
(`_resize_align_corners`) — MXU-friendly and bit-faithful to the
checkpoint's sampling grid (held by tests/test_torch_parity.py).

Pointmap parameterization ("exp" mode): raw u -> u / |u| * expm1(|u|), which
maps R^3 onto all of R^3 with better-conditioned gradients near zero.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ("DPTHead", "DescriptorHead", "postprocess_pointmap")


def _interp_matrix_ac(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) linear-interpolation matrix with torch
    align_corners=True sampling: src(i) = i * (n_in-1) / (n_out-1)."""
    import numpy as np
    if n_in == 1 or n_out == 1:
        return jnp.ones((n_out, n_in), jnp.float32) / n_in
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    w = (src - lo).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), lo] = 1.0 - w
    mat[np.arange(n_out), lo + 1] += w
    return jnp.asarray(mat)


def _resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int):
    """Bilinear resize of (B, H, W, C) with align_corners=True semantics,
    as two dense matmuls over the spatial dims (static shapes -> the
    matrices are compile-time constants; XLA maps them onto the MXU)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    ah = _interp_matrix_ac(h, out_h)          # (out_h, h)
    aw = _interp_matrix_ac(w, out_w)          # (out_w, w)
    dt = x.dtype
    x = jnp.einsum("oh,bhwc->bowc", ah.astype(dt), x)
    return jnp.einsum("pw,bowc->bopc", aw.astype(dt), x)


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


class _DenseUpsample(nn.Module):
    """Non-overlapping transposed conv (kernel == stride) as Dense +
    pixel-shuffle: out[y*r+dy, x*r+dx, o] = sum_c in[y, x, c] W[c, dy,dx,o].
    One big GEMM on the MXU instead of a ConvTranspose."""

    dim: int
    r: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        r = self.r
        x = nn.Dense(self.dim * r * r, dtype=self.dtype, name="dense")(x)
        x = x.reshape(b, h, w, r, r, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * r, w * r, self.dim)


class _ResUnit(nn.Module):
    """ResidualConvUnit: x + conv2(relu(conv1(relu(x))))."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        r = nn.relu(x)
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(r)
        r = nn.relu(r)
        r = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(r)
        return x + r


class _FusionBlock(nn.Module):
    """FeatureFusionBlock: optional skip through res1, res2, x2 upsample,
    1x1 out_conv."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + _ResUnit(self.dim, self.dtype, name="res1")(skip)
        x = _ResUnit(self.dim, self.dtype, name="res2")(x)
        b, h, w, c = x.shape
        # torch F.interpolate(scale_factor=2, align_corners=True)
        x = _resize_align_corners(x, h * 2, w * 2)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    """Dense Prediction Transformer head over 4 hook states
    ([encoder_out, dec_mid1, dec_mid2, dec_final] — the reference's
    hooks_idx=[0, 2L/4, 3L/4, L] over [enc] + decoder states).

    Reassembles token states into pyramid feature maps (x4, x2, x1, x0.5 of
    the patch grid), fuses coarse->fine with residual conv blocks, and
    predicts ``out_ch`` channels at full image resolution.
    """

    out_ch: int = 4
    feature_dim: int = 256
    layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    last_dim: int = 128
    patch_size: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, states: Sequence[jnp.ndarray], hp: int, wp: int,
                 img_h: int, img_w: int) -> jnp.ndarray:
        assert len(states) == 4
        b = states[0].shape[0]
        fd = self.feature_dim
        feats = []
        for i, s in enumerate(states):
            ld = self.layer_dims[i]
            f = nn.Dense(ld, dtype=self.dtype, name=f"act{i}_proj")(s)
            f = f.reshape(b, hp, wp, ld)
            if i == 0:
                f = _DenseUpsample(ld, 4, self.dtype, name="act0_up")(f)
            elif i == 1:
                f = _DenseUpsample(ld, 2, self.dtype, name="act1_up")(f)
            elif i == 3:
                # stride-2 3x3 conv, symmetric padding (torch padding=1)
                f = nn.Conv(ld, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name="act3_down")(f)
            f = nn.Conv(fd, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"layer{i + 1}_rn")(f)
            feats.append(f)
        # fusion, deepest (smallest) first: refinenet4 -> refinenet1
        x = _FusionBlock(fd, self.dtype, name="refinenet4")(feats[3])
        x = _FusionBlock(fd, self.dtype, name="refinenet3")(x, feats[2])
        x = _FusionBlock(fd, self.dtype, name="refinenet2")(x, feats[1])
        x = _FusionBlock(fd, self.dtype, name="refinenet1")(x, feats[0])
        # x is now at 8x patch grid = img/2 resolution
        x = nn.Conv(fd // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head0")(x)
        x = _resize_align_corners(x, img_h, img_w)
        x = nn.Conv(self.last_dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), dtype=jnp.float32,
                    name="head4")(x)
        return x  # (B, H, W, out_ch) float32


class DescriptorHead(nn.Module):
    """MLP + pixel-shuffle local-feature head (the reference's
    `head_local_features`: Mlp(idim, 4*idim, (desc_dim+1)*p^2)).

    Input: concat of encoder tokens and final decoder tokens; output per
    pixel: desc_dim channels (L2-normalized) + 1 confidence channel.
    """

    desc_dim: int = 24
    patch_size: int = 16
    hidden_factor: float = 4.0   # reference hidden_dim_factor=4 over idim
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, enc_tokens, dec_tokens, hp: int, wp: int):
        x = jnp.concatenate([enc_tokens, dec_tokens], axis=-1)
        b, t, idim = x.shape
        p = self.patch_size
        out_ch = self.desc_dim + 1
        hidden = int(self.hidden_factor * idim)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is erf-exact
        x = nn.Dense(out_ch * p * p, dtype=jnp.float32, name="fc2")(x)
        # pixel shuffle: (B, T, p*p*C) -> (B, H, W, C); channel-minor
        # (i, j, c) layout — the converter permutes torch's (c, i, j)
        # pixel_shuffle ordering into this layout
        x = x.reshape(b, hp, wp, p, p, out_ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * p, wp * p, out_ch)
        desc = x[..., : self.desc_dim]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        desc_conf = 1.0 + jnp.exp(jnp.clip(x[..., -1], -10.0, 10.0))
        return desc, desc_conf
