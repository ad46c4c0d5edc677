"""MCMC relocation strategy for Gaussian densification.

TPU-native rebuild of gsplat's `MCMCStrategy` (reference chooses it over
DefaultStrategy deliberately: starster/gs.py:41-45; SURVEY §2b "gsplat
MCMCStrategy" row notes this is exactly the densification scheme that fits
TPU static shapes: a fixed-capacity pool where dead slots are *relocated*
onto samples of live Gaussians — N never changes, no dynamic growth).

Semantics (3DGS-as-MCMC, gsplat behavior):
  - every `refine_every` steps in [refine_start, refine_stop):
      dead = opacity < min_opacity; each dead slot is relocated to a live
      Gaussian sampled with probability ∝ opacity; the sampled source and its
      clones share its opacity via the binomial-style correction
      o_new = 1 - (1 - o)^(1/(k+1)) and shrink scales by the clone count;
      Adam state of relocated slots is reset;
  - every step: position noise ∝ lr * noise_lr * sigmoid-gate(1 - opacity),
    shaped by each Gaussian's covariance.

All of it is jit-compatible: relocation is a gather/scatter with masks,
sampling via Gumbel-top-k-style categorical draws.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .rasterize import quat_to_rotmat_wxyz

__all__ = ("MCMCConfig", "relocate_dead", "add_position_noise")


class MCMCConfig(NamedTuple):
    min_opacity: float = 0.005
    noise_lr: float = 5e5
    refine_every: int = 100
    refine_start: int = 500
    refine_stop: int = 25_000


def _sample_alive(key, opacities: jnp.ndarray, dead: jnp.ndarray,
                  n_samples: int) -> jnp.ndarray:
    """Categorical sample of alive indices with prob ∝ opacity (dead get
    probability 0). Returns (n_samples,) int32 indices."""
    logits = jnp.where(dead, -jnp.inf,
                       jnp.log(jnp.maximum(opacities, 1e-12)))
    return jax.random.categorical(key, logits, shape=(n_samples,))


def _inverse_of(fn):
    """Inverse of the activation mapping raw params -> linear values.

    Recognizes the two activations the training loop uses (identity under
    compat_raw_activations, sigmoid/exp otherwise)."""
    if fn is None:
        return lambda x: x
    import numpy as _np
    test = _np.float32(0.31)
    # probing on a concrete host value stays concrete even under an
    # enclosing jit trace, so float() is safe here
    val = float(fn(jnp.asarray(test)))
    if abs(val - test) < 1e-6:                       # identity
        return lambda x: x
    if abs(val - 1.0 / (1.0 + _np.exp(-test))) < 1e-5:  # sigmoid
        return lambda x: jnp.log(x) - jnp.log1p(-x)
    if abs(val - _np.exp(test)) < 1e-5:              # exp
        return jnp.log
    raise ValueError("unrecognized activation for MCMC relocation")


def relocate_dead(key, params: dict, opacity_fn=None,
                  scale_fn=None) -> Tuple[dict, jnp.ndarray]:
    """Relocate dead Gaussians onto samples of live ones.

    params: dict with means (N,3), scales (N,3), quats (N,4),
    opacities (N,), sh0, shN. ``opacity_fn``/``scale_fn`` map the raw
    parameters to linear opacity/scale (identity under
    compat_raw_activations); corrected values are written back through the
    matching inverse so the raw parameterization stays consistent.
    Returns (new_params, relocated_mask (N,) bool) — the mask tells the
    training loop which Adam slots to reset.
    """
    op_raw = params["opacities"]
    op = opacity_fn(op_raw) if opacity_fn is not None else op_raw
    # raw (compat) opacities are unconstrained: clamp to [0, 1) so the
    # binomial correction (1-op)^(1/ratio) cannot see a negative base
    op = jnp.clip(op, 1e-6, 1.0 - 1e-6)
    sc = scale_fn(params["scales"]) if scale_fn is not None \
        else params["scales"]
    inv_op = _inverse_of(opacity_fn)
    inv_sc = _inverse_of(scale_fn)
    n = op.shape[0]
    dead = op <= 0.005

    # sample a live target for EVERY slot (use only where dead)
    targets = _sample_alive(key, op, dead, n)            # (N,)

    # clone count per target: 1 (itself) + number of dead slots pointing at it
    ones = jnp.where(dead, 1, 0)
    counts = jnp.zeros((n,), jnp.int32).at[targets].add(ones)
    ratio = 1.0 + counts.astype(jnp.float32)             # (N,) per *target*

    # corrected opacity/scale (linear space) for relocated copies AND sources
    op_t = op[targets]
    ratio_t = ratio[targets]
    new_op_dead = 1.0 - (1.0 - op_t) ** (1.0 / ratio_t)
    new_scales_dead = sc[targets] / jnp.sqrt(ratio_t)[:, None]

    # sources that were sampled at least once also get the corrected values
    src_touched = counts > 0
    new_op_src = 1.0 - (1.0 - op) ** (1.0 / ratio)
    new_scales_src = sc / jnp.sqrt(ratio)[:, None]

    out = dict(params)
    out["means"] = jnp.where(dead[:, None], params["means"][targets],
                             params["means"])
    out["quats"] = jnp.where(dead[:, None], params["quats"][targets],
                             params["quats"])
    out["sh0"] = jnp.where(dead[:, None, None], params["sh0"][targets],
                           params["sh0"])
    out["shN"] = jnp.where(dead[:, None, None], params["shN"][targets],
                           params["shN"])

    scales = jnp.where(src_touched[:, None], new_scales_src, sc)
    scales = jnp.where(dead[:, None], new_scales_dead, scales)
    out["scales"] = jnp.where((src_touched | dead)[:, None],
                              inv_sc(jnp.maximum(scales, 1e-12)),
                              params["scales"])

    op_new = jnp.where(src_touched, new_op_src, op)
    op_new = jnp.where(dead, new_op_dead, op_new)
    out["opacities"] = jnp.where(
        src_touched | dead,
        inv_op(jnp.clip(op_new, 1e-6, 1.0 - 1e-6)), op_raw)

    relocated = dead | src_touched
    return out, relocated


def add_position_noise(key, params: dict, lr: float,
                       noise_lr: float = 5e5, opacity_fn=None,
                       scale_fn=None) -> dict:
    """Inject covariance-shaped position noise (every-step MCMC exploration).

    noise = R S eps * gate(opacity), gate = sigmoid(-k*(op - thr)) so nearly
    dead Gaussians explore more (gsplat's op_sigmoid gating).
    """
    op_raw = params["opacities"]
    op = opacity_fn(op_raw) if opacity_fn is not None else op_raw
    sc = scale_fn(params["scales"]) if scale_fn is not None \
        else params["scales"]
    eps = jax.random.normal(key, params["means"].shape)
    R = quat_to_rotmat_wxyz(params["quats"])
    shaped = jnp.einsum("nij,nj->ni", R, eps * sc)
    gate = jax.nn.sigmoid(-100.0 * (op - 0.995 * 0.005))
    out = dict(params)
    out["means"] = params["means"] + shaped * (gate * noise_lr * lr)[:, None]
    return out
