"""SSIM in pure jnp (11x11 Gaussian window), matching the torchmetrics
StructuralSimilarityIndexMeasure(data_range=1) semantics used by the
reference's 3DGS loss (reference: starster/gs.py:10,39,129; SURVEY §2b
"SSIM metric" row).

Implemented as depthwise convolutions — XLA fuses these well on TPU; no
custom kernel needed (conv maps onto the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ("ssim", "psnr")


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float):
    # pure numpy on purpose: under a jit trace even jnp.asarray(np_array)
    # yields a Tracer, and caching a Tracer across jits raises
    # UnexpectedTracerError — callers coerce per use
    import numpy as np
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / np.sum(g)


def _filter2d(img, win):
    """Separable Gaussian filter. img: (B, H, W, C); win: (K,)."""
    k = win.shape[0]
    c = img.shape[-1]
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))  # (K,1,1,C)
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, (k, 1, 1, c)[-2:] + (k, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        img, kern_h, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, kern_w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0,
         window_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over a batch of images.

    img1, img2: (H, W, C) or (B, H, W, C), float in [0, data_range].
    Returns a scalar (mean over batch, spatial dims, channels) — matching
    torchmetrics' default `reduction='elementwise_mean'` and
    `gaussian_kernel=True, kernel_size=11, sigma=1.5`.
    """
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    win = _gaussian_window(window_size, sigma)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _filter2d(img1, win)
    mu2 = _filter2d(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, win) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, win) - mu2_sq
    sigma12 = _filter2d(img1 * img2, win) - mu12

    num = (2 * mu12 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return jnp.mean(num / den)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 1.0):
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
