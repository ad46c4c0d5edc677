"""MCMC relocation + growth strategy for Gaussian densification.

TPU-native rebuild of gsplat's `MCMCStrategy` (reference chooses it over
DefaultStrategy deliberately: starster/gs.py:41-45; SURVEY §2b "gsplat
MCMCStrategy" row). The TPU design is a FIXED-CAPACITY pool with an alive
count: params are allocated at pool capacity once (static shapes), the first
`n_alive` slots are active, and both gsplat behaviors map onto it:

  - relocation: dead slots (opacity < min_opacity) are moved onto samples of
    live Gaussians with probability ∝ opacity;
  - growth toward `cap_max` (gsplat's `add_new_gs`, +5%/refine): slots
    [n_alive, n_target) are activated and treated exactly like dead slots —
    relocated onto live samples — so growth is relocation of virgin slots
    and N never changes at the XLA level.

Relocated copies and their source share opacity via the binomial-style
correction o_new = 1 - (1 - o)^(1/(k+1)) (clamped to [min_opacity, 1-eps],
matching gsplat's relocate()) and shrink scales by the clone count; Adam
state of relocated slots is reset by the caller via the returned mask.
Every step, position noise ∝ lr * noise_lr * sigmoid-gate(1 - opacity)
shaped by each Gaussian's covariance is injected into alive slots.

All of it is jit-compatible: relocation is a gather/scatter with masks,
sampling via categorical draws, growth a traced integer bump of `n_alive`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .rasterize import quat_to_rotmat_wxyz

__all__ = ("MCMCConfig", "relocate_dead", "add_position_noise",
           "grow_target")

# (activation, inverse) pairs mapping raw params <-> linear values.
# Passed explicitly (not probed at runtime) so composed/clamped activations
# added later fail loudly at the call site, not at trace time.
ActPair = Tuple[Callable, Callable]

_IDENTITY: ActPair = (lambda x: x, lambda x: x)


class MCMCConfig(NamedTuple):
    cap_max: int = 1_000_000        # gsplat MCMCStrategy default
    min_opacity: float = 0.005
    noise_lr: float = 5e5
    refine_every: int = 100
    refine_start: int = 500
    refine_stop: int = 25_000
    grow_factor: float = 1.05       # gsplat add_new_gs: +5% per refine


def _sample_alive(key, opacities: jnp.ndarray, live: jnp.ndarray,
                  n_samples: int) -> jnp.ndarray:
    """Categorical sample of live indices with prob ∝ opacity (non-live get
    probability 0). Returns (n_samples,) int32 indices."""
    logits = jnp.where(live, jnp.log(jnp.maximum(opacities, 1e-12)),
                       -jnp.inf)
    return jax.random.categorical(key, logits, shape=(n_samples,))


def grow_target(n_alive: jnp.ndarray, capacity: int,
                mcfg: MCMCConfig) -> jnp.ndarray:
    """gsplat add_new_gs target: min(cap, floor(grow_factor * n_alive))."""
    cap = min(capacity, mcfg.cap_max)
    tgt = jnp.floor(n_alive.astype(jnp.float32) * mcfg.grow_factor)
    tgt = jnp.minimum(tgt.astype(jnp.int32), cap)
    return jnp.maximum(tgt, n_alive)


def relocate_dead(key, params: dict, opacity_act: Optional[ActPair] = None,
                  scale_act: Optional[ActPair] = None, *,
                  min_opacity: float = 0.005,
                  n_alive: Optional[jnp.ndarray] = None,
                  n_target: Optional[jnp.ndarray] = None,
                  ) -> Tuple[dict, jnp.ndarray]:
    """Relocate dead (and newly grown) Gaussians onto samples of live ones.

    params: dict with means (N,3), scales (N,3), quats (N,4),
    opacities (N,), sh0, shN. ``opacity_act``/``scale_act`` are
    (activation, inverse) pairs mapping raw parameters to linear
    opacity/scale (identity under compat_raw_activations); corrected values
    are written back through the inverse so the raw parameterization stays
    consistent.

    ``n_alive`` (traced int, optional): only slots < n_alive are live; when
    ``n_target`` > n_alive is also given, slots [n_alive, n_target) are
    activated by treating them as dead (the growth path — gsplat's
    add_new_gs relocation math is identical to its dead-relocation math).

    Returns (new_params, relocated_mask (N,) bool) — the mask tells the
    training loop which Adam slots to reset.
    """
    op_fn, op_inv = opacity_act if opacity_act is not None else _IDENTITY
    sc_fn, sc_inv = scale_act if scale_act is not None else _IDENTITY
    op_raw = params["opacities"]
    op = op_fn(op_raw)
    # raw (compat) opacities are unconstrained: clamp to [0, 1) so the
    # binomial correction (1-op)^(1/ratio) cannot see a negative base
    op = jnp.clip(op, 1e-6, 1.0 - 1e-6)
    sc = sc_fn(params["scales"])
    n = op.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if n_alive is None:
        prefix = jnp.ones((n,), bool)
        grown = jnp.zeros((n,), bool)
    else:
        prefix = idx < n_alive
        upper = n_alive if n_target is None else n_target
        grown = (idx >= n_alive) & (idx < upper)
    dead = (prefix & (op <= min_opacity)) | grown
    live = prefix & ~dead

    # sample a live target for EVERY slot (use only where dead)
    targets = _sample_alive(key, op, live, n)            # (N,)

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
                              sc_inv(jnp.maximum(scales, 1e-12)),
                              params["scales"])

    op_new = jnp.where(src_touched, new_op_src, op)
    op_new = jnp.where(dead, new_op_dead, op_new)
    # gsplat relocate() clamps to min=min_opacity: the binomial correction
    # routinely falls below it (e.g. op=0.008, ratio=2 -> 0.004), and
    # without the floor relocated slots are immediately dead again at the
    # next refine (relocation thrash).
    out["opacities"] = jnp.where(
        src_touched | dead,
        op_inv(jnp.clip(op_new, min_opacity, 1.0 - 1e-6)), op_raw)

    relocated = dead | src_touched
    return out, relocated


def add_position_noise(key, params: dict, lr: float,
                       noise_lr: float = 5e5,
                       opacity_act: Optional[ActPair] = None,
                       scale_act: Optional[ActPair] = None,
                       n_alive: Optional[jnp.ndarray] = None) -> dict:
    """Inject covariance-shaped position noise (every-step MCMC exploration).

    noise = Σ eps * gate(opacity) with Σ = R diag(s²) Rᵀ the FULL 3D
    covariance (gsplat _add_noise_to_gs multiplies the sampled vector by
    the covariance matrix, not its square root — at s ~ 3e-2 world units
    the sqrt version is ~30x too large and sent every dying Gaussian
    roaming, round-5 bisection: train PSNR 22 -> 8.4 with noise on);
    gate = sigmoid(-k*(op - thr)) so nearly dead Gaussians explore more
    (gsplat's op_sigmoid gating). Only alive slots move when ``n_alive``
    is given.
    """
    op_fn, _ = opacity_act if opacity_act is not None else _IDENTITY
    sc_fn, _ = scale_act if scale_act is not None else _IDENTITY
    op = op_fn(params["opacities"])
    sc = sc_fn(params["scales"])
    eps = jax.random.normal(key, params["means"].shape)
    R = quat_to_rotmat_wxyz(params["quats"])
    # Σ eps = R diag(s²) Rᵀ eps, evaluated right-to-left (three cheap
    # (N,3) contractions instead of materializing Σ)
    shaped = jnp.einsum("nij,nj->ni", R,
                        sc * sc * jnp.einsum("nji,nj->ni", R, eps))
    gate = jax.nn.sigmoid(-100.0 * (op - 0.995 * 0.005))
    step = shaped * (gate * noise_lr * lr)[:, None]
    if n_alive is not None:
        alive = jnp.arange(op.shape[0], dtype=jnp.int32) < n_alive
        step = jnp.where(alive[:, None], step, 0.0)
    out = dict(params)
    out["means"] = params["means"] + step
    return out
