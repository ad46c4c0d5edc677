"""LR schedules and robust losses for global alignment.

Behavioral spec (SURVEY §2a GA row): cosine LR schedule with manual LR
injection (reference: starster/reconstruct.py:371-391 via mast3r helpers
`cosine_schedule` / `adjust_learning_rate_by_lr`), and the alpha-annealed
robust `gamma_loss` (call sites reconstruct.py:118-120,375,389).

The reference gamma loss (mast3r sparse_ga) is the "meta" form: at anneal
state ``alpha`` (going 1 -> 0 over the run) the pixel loss on distances d is

    loss(d; gamma, alpha) stays |d|^g with g annealed from 1 toward gamma:
        g(alpha) = alpha * 1 + (1 - alpha) * gamma   (linear anneal)

computed stably as ``(d + eps)^g`` on nonnegative distances. We expose both
the annealed meta form and a fixed-gamma form.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ("cosine_schedule", "linear_schedule", "gamma_loss", "meta_gamma_loss")


def cosine_schedule(alpha, lr_base, lr_end=0.0):
    """alpha in [0, 1] (fraction of run completed) -> lr.

    lr(0) = lr_base, lr(1) = lr_end, half-cosine in between.
    """
    return lr_end + (lr_base - lr_end) * (1.0 + jnp.cos(jnp.pi * alpha)) / 2.0


def linear_schedule(alpha, lr_base, lr_end=0.0):
    return lr_base + (lr_end - lr_base) * alpha


def gamma_loss(dist, gamma: float, eps: float = 1e-3):
    """Robust |d|^gamma applied to nonnegative distances ``dist``.

    gamma < 1 downweights outliers. eps keeps the gradient finite at 0.
    """
    return (dist + eps) ** gamma - eps ** gamma


def meta_gamma_loss(dist, gamma: float, alpha, eps: float = 1e-3):
    """Annealed robust loss: exponent g = alpha*1 + (1-alpha)*gamma.

    The GA optimize loop calls this with alpha = 1 - iter/niter (reference
    passes ``pix_loss(1 - alpha)`` where its alpha = iter/niter,
    reconstruct.py:387-389), so the loss starts as plain L1 (g=1) and anneals
    to |d|^gamma by the end of the phase.
    """
    g = alpha * 1.0 + (1.0 - alpha) * gamma
    return (dist + eps) ** g - eps ** g
