"""3DGS init / render / training loop.

Behavioral spec (reference: starster/gs.py):
  init (gs.py:14-45): one Gaussian per dense point; scales = init_scale
    (linear, 3e-3), quats identity wxyz, opacities 1, sh0 and ALL 24 shN
    bands = 1 - color (SURVEY §2a quirk 2 — reproduced under
    compat_inverted_sh); Adam lr=1e-3 on every param (the reference's six
    Adam instances are elementwise-identical to one Adam — SURVEY §7.5);
    MCMC strategy state initialized.
  render (gs.py:47-95): rasterize with colors=shN, sh_degree=1 from
    arbitrary (w2c, K) or from all original cameras.
  optimize (gs.py:97-166): every step renders ALL cameras; loss per camera =
    0.8*L1 + 0.2*(1-SSIM) plus opacity/scale regularizers (note: the
    reference adds the regularizers inside the per-camera loop, so they are
    effectively multiplied by the camera count — reproduced); backward; Adam
    step; MCMC relocation + noise when pruning is enabled.

TPU-first: the entire step (render all cameras + loss + grads + Adam update)
is ONE jitted function; GT images are stacked on device once (the reference
re-uploads each GT every step — gs.py:150-152 — we do not, SURVEY §7.5);
optional camera minibatching behind `camera_batch` (0 = reference behavior).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SplatConfig
from ..ops.ssim import ssim as ssim_fn
from .mcmc import MCMCConfig, add_position_noise, relocate_dead
from .rasterize import rasterize

__all__ = ("GSState", "init_gaussians", "render", "train_step",
           "run_optim")


class GSState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    step: jnp.ndarray
    key: jnp.ndarray


def init_gaussians(points: np.ndarray, colors: np.ndarray,
                   cfg: SplatConfig, seed: int = 0) -> GSState:
    """points (N, 3) float; colors (N, 3) float in [0, 1]."""
    n = points.shape[0]
    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    if cfg.compat_inverted_sh:
        sh_val = 1.0 - cols                     # reference gs.py:29-31
    else:
        sh_val = (cols - 0.5) / 0.28209479177387814
    quats = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    params = {
        "means": pts,
        "scales": jnp.full((n, 3), cfg.init_scale, jnp.float32),
        "quats": quats,
        "opacities": jnp.ones((n,), jnp.float32),
        "sh0": sh_val[:, None, :],
        "shN": jnp.tile(sh_val[:, None, :], (1, cfg.sh_bands, 1)),
    }
    if not cfg.compat_inverted_sh:
        params["shN"] = jnp.zeros((n, cfg.sh_bands, 3), jnp.float32)
    opt = optax.adam(cfg.lr)
    return GSState(params=params, opt_state=opt.init(params),
                   step=jnp.asarray(0), key=jax.random.PRNGKey(seed))


def _opacity_fn(cfg: SplatConfig):
    if cfg.compat_raw_activations:
        return lambda x: x
    return jax.nn.sigmoid


def _scale_fn(cfg: SplatConfig):
    if cfg.compat_raw_activations:
        return lambda x: x
    return jnp.exp


def render(params: Dict[str, jnp.ndarray], w2c, Ks, width: int, height: int,
           cfg: SplatConfig):
    """Reference-equivalent render: colors=shN, sh_degree=1 (gs.py:76-87).

    Returns (rgb (C,H,W,3), alpha (C,H,W,1), info).
    """
    op = _opacity_fn(cfg)(params["opacities"])
    sc = _scale_fn(cfg)(params["scales"])
    return rasterize(
        params["means"], params["quats"], sc, op, params["shN"],
        jnp.asarray(w2c), jnp.asarray(Ks), width, height,
        sh_degree=cfg.sh_degree, tile_size=cfg.tile_size,
        tile_window=3, max_per_tile=1024, chunk=128)


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg",
                                             "n_cams"))
def train_step(state: GSState, gt: jnp.ndarray, w2c: jnp.ndarray,
               Ks: jnp.ndarray, width: int, height: int, cfg: SplatConfig,
               n_cams: int):
    """One optimization step over all cameras. gt: (C, H, W, 3) in [0,1]."""
    opt = optax.adam(cfg.lr)

    def loss_fn(params):
        rgb, alpha, _ = render(params, w2c, Ks, width, height, cfg)
        l1 = jnp.mean(jnp.abs(gt - rgb), axis=(1, 2, 3))          # (C,)
        ssim_val = jax.vmap(lambda a, b: ssim_fn(a, b))(gt, rgb)  # (C,)
        per_cam = (l1 * (1 - cfg.loss_ssim_fac)
                   + (1.0 - ssim_val) * cfg.loss_ssim_fac)
        loss = jnp.sum(per_cam)
        # reference adds the regs once per camera (gs.py:126-136 called in
        # the per-camera loop) -> multiply by C
        reg_o = jnp.mean(jnp.abs(jax.nn.sigmoid(params["opacities"])))
        reg_s = jnp.mean(jnp.abs(jnp.exp(params["scales"])))
        loss = loss + n_cams * (cfg.loss_opacity_fac * reg_o
                                + cfg.loss_scale_fac * reg_s)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return GSState(params=params, opt_state=opt_state,
                   step=state.step + 1, key=state.key), loss


@functools.partial(jax.jit, static_argnames=("lr", "cfg", "mcfg",
                                             "do_refine"))
def _mcmc_post_step(state: GSState, lr: float, cfg: SplatConfig,
                    mcfg: MCMCConfig, do_refine: bool) -> GSState:
    key, k1, k2 = jax.random.split(state.key, 3)
    params = state.params
    opt_state = state.opt_state

    if do_refine:
        params, relocated = relocate_dead(k1, params, _opacity_fn(cfg),
                                          _scale_fn(cfg))
        # reset Adam moments of relocated slots
        def reset(leaf_state, param_name_mask):
            return leaf_state

        def mask_like(x):
            m = relocated
            while m.ndim < x.ndim:
                m = m[..., None]
            return jnp.where(m, jnp.zeros_like(x), x)

        # optax.adam state: (ScaleByAdamState(count, mu, nu), EmptyState)
        inner, rest = opt_state
        inner = inner._replace(
            mu=jax.tree_util.tree_map(mask_like, inner.mu),
            nu=jax.tree_util.tree_map(mask_like, inner.nu))
        opt_state = (inner, rest)

    params = add_position_noise(k2, params, lr, mcfg.noise_lr,
                                _opacity_fn(cfg), _scale_fn(cfg))
    return GSState(params=params, opt_state=opt_state, step=state.step,
                   key=key)


def run_optim(state: GSState, gt_images: np.ndarray, w2c: np.ndarray,
              Ks: np.ndarray, iters: int, cfg: SplatConfig,
              enable_pruning: bool = False,
              mcfg: MCMCConfig = MCMCConfig(),
              verbose: bool = False,
              mesh=None) -> Tuple[GSState, List[float]]:
    """The reference's run_3dgs_optim loop (gs.py:97-166).

    mesh: optional jax Mesh — Gaussians (and Adam moments) are sharded over
    its first axis; cameras/GT replicate (SURVEY §2c splat row)."""
    if mesh is not None:
        from ..parallel import replicate, shard_gs_state
        state = shard_gs_state(state, mesh)
        gt_images = jax.device_put(jnp.asarray(gt_images, jnp.float32),
                                   replicate(mesh))
    gt = jnp.asarray(gt_images, jnp.float32)
    c, h, w = gt.shape[0], gt.shape[1], gt.shape[2]
    w2c_j = jnp.asarray(w2c, jnp.float32)
    ks_j = jnp.asarray(Ks, jnp.float32)
    losses: List[float] = []
    for it in range(iters):
        state, loss = train_step(state, gt, w2c_j, ks_j, w, h, cfg, c)
        if enable_pruning:
            step = int(state.step)
            do_refine = (step >= mcfg.refine_start
                         and step < mcfg.refine_stop
                         and step % mcfg.refine_every == 0)
            state = _mcmc_post_step(state, cfg.lr, cfg, mcfg, do_refine)
        losses.append(float(loss))
        if verbose and (it % 50 == 0 or it == iters - 1):
            print(f"[3dgs] step {int(state.step)} loss={losses[-1]:.4f}")
    return state, losses
