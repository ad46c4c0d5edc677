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
    step; MCMC relocation + growth + noise when pruning is enabled.

TPU-first: the entire step (render all cameras + loss + grads + Adam update)
is ONE jitted function; GT images are stacked on device once (the reference
re-uploads each GT every step — gs.py:150-152 — we do not, SURVEY §7.5);
Gaussians live in a FIXED-CAPACITY pool with an alive count (static shapes;
growth = activating slots, see mcmc.py); optional camera minibatching behind
`SplatConfig.camera_batch` (0 = reference behavior: all cameras every step).
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
from .mcmc import MCMCConfig, add_position_noise, grow_target, relocate_dead
from .rasterize import bin_gaussians, rasterize

__all__ = ("GSState", "init_gaussians", "render", "train_step",
           "run_optim", "mcmc_config_from", "make_optimizer")


class GSState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    step: jnp.ndarray
    key: jnp.ndarray
    n_alive: jnp.ndarray      # () int32 — slots < n_alive are active


def make_optimizer(cfg: SplatConfig) -> optax.GradientTransformation:
    """Adam with optional per-parameter learning rates (SplatConfig
    lr_means/lr_quats/lr_scales/lr_opacities/lr_sh; None = cfg.lr — the
    reference's uniform-lr Adam, gs.py:37).

    Built as scale_by_adam + a stateless per-key lr scale so the state
    pytree is EXACTLY optax.adam's (ScaleByAdamState, EmptyState)
    regardless of the lr settings — the MCMC moment reset
    (_mcmc_post_step_jit) and checkpointed opt states stay valid."""
    lrs = {"means": cfg.lr_means, "quats": cfg.lr_quats,
           "scales": cfg.lr_scales, "opacities": cfg.lr_opacities,
           "sh0": cfg.lr_sh, "shN": cfg.lr_sh}

    def scale_fn(updates, state, params=None):
        del params
        out = {k: v * (-(lrs[k] if lrs.get(k) is not None else cfg.lr))
               for k, v in updates.items()}
        return out, state

    return optax.chain(
        optax.scale_by_adam(),
        optax.GradientTransformation(lambda _: optax.EmptyState(),
                                     scale_fn))


def mcmc_config_from(cfg: SplatConfig) -> MCMCConfig:
    """Build the MCMC schedule from the user-facing SplatConfig knobs."""
    return MCMCConfig(
        cap_max=cfg.cap_max,
        min_opacity=cfg.mcmc_min_opacity,
        noise_lr=cfg.mcmc_noise_lr,
        refine_every=cfg.mcmc_refine_every,
        refine_start=cfg.mcmc_refine_start,
        refine_stop=cfg.mcmc_refine_stop,
        grow_factor=cfg.mcmc_grow_factor,
    )


def init_gaussians(points: np.ndarray, colors: np.ndarray,
                   cfg: SplatConfig, seed: int = 0,
                   pool_size: int = 0,
                   point_scales: Optional[np.ndarray] = None) -> GSState:
    """points (N, 3) float; colors (N, 3) float in [0, 1].

    pool_size > N allocates extra (inactive) capacity so MCMC growth toward
    `cfg.cap_max` can activate slots without reallocating (static shapes).
    point_scales: optional per-point LINEAR scales, (N,) or (N, 3) world
    units, overriding the scalar cfg.init_scale — e.g. the local point
    spacing depth*subsample/focal, so near points get small splats and far
    points large ones (uniform init over-draws near surfaces and
    under-covers far ones).
    """
    n = points.shape[0]
    cap = max(n, pool_size)
    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    if cfg.compat_inverted_sh:
        sh_val = 1.0 - cols                     # reference gs.py:29-31
    else:
        sh_val = (cols - 0.5) / 0.28209479177387814
    quats = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    # store params in RAW (pre-activation) space: the rasterizer receives
    # activation(raw). compat mode is identity (reference passes raw values
    # unactivated — SURVEY §2a quirk 3); the fixed mode stores log-scale /
    # logit-opacity so the initial ACTIVATED values equal init_scale / ~1.
    inv_s = _scale_act(cfg)[1]
    inv_o = _opacity_act(cfg)[1]
    raw_scale = float(inv_s(jnp.float32(cfg.init_scale)))
    raw_op = float(inv_o(jnp.float32(0.95 if not cfg.compat_raw_activations
                                     else 1.0)))
    if point_scales is not None:
        ps = jnp.asarray(point_scales, jnp.float32)
        if ps.ndim == 1:
            ps = ps[:, None]
        scales0 = inv_s(jnp.broadcast_to(ps, (n, 3)))
    else:
        scales0 = jnp.full((n, 3), raw_scale, jnp.float32)
    params = {
        "means": pts,
        "scales": scales0,
        "quats": quats,
        "opacities": jnp.full((n,), raw_op, jnp.float32),
        "sh0": sh_val[:, None, :],
        "shN": jnp.tile(sh_val[:, None, :], (1, cfg.sh_bands, 1)),
    }
    if not cfg.compat_inverted_sh:
        # rendering passes colors=shN (reference gs.py:81,86), so the DC
        # term the rasterizer reads is shN[:, 0] (SURVEY §2a quirk 2):
        # place the true SH DC there, zero the directional bands.
        shn = jnp.zeros((n, cfg.sh_bands, 3), jnp.float32)
        params["shN"] = shn.at[:, 0, :].set(sh_val)
    if cap > n:
        pad = cap - n

        def pad0(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

        params = {k: pad0(v) for k, v in params.items()}
        # inactive slots: identity quats, init scale (relocation overwrites)
        params["quats"] = params["quats"].at[n:, 0].set(1.0)
        params["scales"] = params["scales"].at[n:].set(raw_scale)
    opt = make_optimizer(cfg)
    return GSState(params=params, opt_state=opt.init(params),
                   step=jnp.asarray(0), key=jax.random.PRNGKey(seed),
                   n_alive=jnp.asarray(n, jnp.int32))


def _opacity_act(cfg: SplatConfig):
    """(activation, inverse) pair raw -> linear opacity."""
    if cfg.compat_raw_activations:
        return (lambda x: x, lambda x: x)
    return (jax.nn.sigmoid, lambda x: jnp.log(x) - jnp.log1p(-x))


def _scale_act(cfg: SplatConfig):
    if cfg.compat_raw_activations:
        return (lambda x: x, lambda x: x)
    return (jnp.exp, jnp.log)


def render(params: Dict[str, jnp.ndarray], w2c, Ks, width: int, height: int,
           cfg: SplatConfig, n_alive: Optional[jnp.ndarray] = None,
           bins=None):
    """Reference-equivalent render: colors=shN, sh_degree=1 (gs.py:76-87).

    n_alive (optional traced int): inactive pool slots render with opacity 0.
    bins: optional precomputed `bin_gaussians` result (rebin_every reuse).
    Returns (rgb (C,H,W,3), alpha (C,H,W,1), info).
    """
    op = _opacity_act(cfg)[0](params["opacities"])
    sc = _scale_act(cfg)[0](params["scales"])
    if n_alive is not None:
        alive = jnp.arange(op.shape[0], dtype=jnp.int32) < n_alive
        op = jnp.where(alive, op, 0.0)
    return rasterize(
        params["means"], params["quats"], sc, op, params["shN"],
        jnp.asarray(w2c), jnp.asarray(Ks), width, height,
        sh_degree=cfg.sh_degree, tile_size=cfg.tile_size,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_per_tile=cfg.max_per_tile, chunk=cfg.chunk, bins=bins)


def compute_bins(params: Dict[str, jnp.ndarray], w2c, Ks, width: int,
                 height: int, cfg: SplatConfig,
                 n_alive: Optional[jnp.ndarray] = None):
    """Tile-binning index structure for `train_step(..., bins=...)`."""
    op = _opacity_act(cfg)[0](params["opacities"])
    sc = _scale_act(cfg)[0](params["scales"])
    if n_alive is not None:
        alive = jnp.arange(op.shape[0], dtype=jnp.int32) < n_alive
        op = jnp.where(alive, op, 0.0)
    return bin_gaussians(
        params["means"], params["quats"], sc, op, params["shN"],
        jnp.asarray(w2c), jnp.asarray(Ks), width, height,
        sh_degree=cfg.sh_degree, tile_size=cfg.tile_size,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_per_tile=cfg.max_per_tile)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length() if x > 1 else 1


def _scene_max_area(params, w2c, Ks, width, height, cfg, n_alive):
    from .rasterize import max_bbox_area
    op = _opacity_act(cfg)[0](params["opacities"])
    sc = _scale_act(cfg)[0](params["scales"])
    if n_alive is not None:
        alive = jnp.arange(op.shape[0], dtype=jnp.int32) < n_alive
        op = jnp.where(alive, op, 0.0)
    return int(jax.device_get(max_bbox_area(
        params["means"], params["quats"], sc, op, params["shN"],
        jnp.asarray(w2c), jnp.asarray(Ks), width, height,
        tile_size=cfg.tile_size)))


def _autobudget_cfg(state: GSState, w2c, Ks, width, height,
                    cfg: SplatConfig) -> SplatConfig:
    """Smallest power-of-2 tile budgets the scene needs right now.

    The configured max_tiles_per_gaussian / max_per_tile become CEILINGS;
    below them nothing is ever dropped (the loop grows the bucket — one
    recompile — when the scene outgrows it), at the ceiling the reference
    counted-cap semantics apply unchanged."""
    import dataclasses
    area = _scene_max_area(state.params, w2c, Ks, width, height, cfg,
                           state.n_alive)
    mt = min(_next_pow2(max(area, 2)), cfg.max_tiles_per_gaussian)
    probe = compute_bins(
        state.params, w2c, Ks, width, height,
        dataclasses.replace(cfg, max_tiles_per_gaussian=mt),
        n_alive=state.n_alive)
    mc = int(jax.device_get(jnp.max(probe.max_count)))
    # floor 128: the Pallas compositing kernels need K % 128 == 0 (lane
    # width); the extra slots on sparse scenes are opacity-0 no-ops
    mpt = min(max(_next_pow2(int(mc * 1.25) + 1), 128), cfg.max_per_tile)
    return dataclasses.replace(cfg, max_tiles_per_gaussian=mt,
                               max_per_tile=mpt)


# SplatConfig fields that do NOT appear in any jitted graph (host-side
# loop/init knobs). `_graph_cfg` pins them to canonical values before a
# config is used as a static jit argument, so e.g. rebin_every=1 vs 4 or a
# different MCMC schedule does not force a 100+ s recompile of an
# identical train-step graph (TPU compiles over the axon tunnel are slow).
_NON_GRAPH_FIELDS = dict(
    init_scale=3e-3, auto_budget=True, rebin_every=1, cap_max=1_000_000,
    mcmc_min_opacity=0.005, mcmc_noise_lr=5e5, mcmc_refine_every=100,
    mcmc_refine_start=500, mcmc_refine_stop=25_000, mcmc_grow_factor=1.05,
    pool_headroom=2.0, camera_batch=0)


def _graph_cfg(cfg: SplatConfig) -> SplatConfig:
    import dataclasses
    return dataclasses.replace(cfg, **_NON_GRAPH_FIELDS)


def train_step(state: GSState, gt: jnp.ndarray, w2c: jnp.ndarray,
               Ks: jnp.ndarray, width: int, height: int, cfg: SplatConfig,
               n_cams: int, bins=None, anchors=None):
    """One optimization step over all cameras. gt: (C, H, W, 3) in [0,1].

    bins: optional `compute_bins` result (cfg.rebin_every reuse — skips
    the two binning sorts; gradients stay exact).
    anchors: optional (cap, 3) seed positions for the drift prior
    (cfg.loss_anchor_fac > 0)."""
    return _train_step(state, gt, w2c, Ks, width, height, _graph_cfg(cfg),
                       n_cams, bins, anchors)


# donate the incoming state: params + Adam moments are ~1.1 GB at the 1M-
# Gaussian pool and the async dispatch queue otherwise keeps one full copy
# live per in-flight step (5 queued steps OOM'd the 16 GB chip in the
# bench timing loop). Donation is a TPU-only win; CPU jit would only warn.
_DONATE = (0,) if jax.default_backend() == "tpu" else ()


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg",
                                             "n_cams"),
                   donate_argnums=_DONATE)
def _train_step(state: GSState, gt: jnp.ndarray, w2c: jnp.ndarray,
                Ks: jnp.ndarray, width: int, height: int, cfg: SplatConfig,
                n_cams: int, bins=None, anchors=None):
    opt = make_optimizer(cfg)
    cap = state.params["means"].shape[0]
    alive = (jnp.arange(cap, dtype=jnp.int32) < state.n_alive)
    denom = jnp.maximum(state.n_alive.astype(jnp.float32), 1.0)

    def loss_fn(params):
        rgb, alpha, _ = render(params, w2c, Ks, width, height, cfg,
                               n_alive=state.n_alive, bins=bins)
        l1 = jnp.mean(jnp.abs(gt - rgb), axis=(1, 2, 3))          # (C,)
        ssim_val = jax.vmap(lambda a, b: ssim_fn(a, b))(gt, rgb)  # (C,)
        per_cam = (l1 * (1 - cfg.loss_ssim_fac)
                   + (1.0 - ssim_val) * cfg.loss_ssim_fac)
        loss = jnp.sum(per_cam)
        # reference adds the regs once per camera (gs.py:126-136 called in
        # the per-camera loop) -> multiply by C; means over ALIVE slots only
        reg_o = jnp.sum(jnp.abs(jax.nn.sigmoid(params["opacities"]))
                        * alive) / denom
        reg_s = jnp.sum(jnp.abs(jnp.exp(params["scales"]))
                        * alive[:, None]) / (3.0 * denom)
        loss = loss + n_cams * (cfg.loss_opacity_fac * reg_o
                                + cfg.loss_scale_fac * reg_s)
        if cfg.loss_anchor_fac > 0.0 and anchors is not None:
            drift = jnp.sum((params["means"] - anchors) ** 2, axis=-1)
            loss = loss + cfg.loss_anchor_fac * jnp.sum(
                drift * alive) / denom
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return GSState(params=params, opt_state=opt_state,
                   step=state.step + 1, key=state.key,
                   n_alive=state.n_alive), loss


def _mcmc_post_step(state: GSState, lr: float, cfg: SplatConfig,
                    mcfg: MCMCConfig, do_refine: bool) -> GSState:
    return _mcmc_post_step_jit(state, lr, _graph_cfg(cfg), mcfg, do_refine)


@functools.partial(jax.jit, static_argnames=("lr", "cfg", "mcfg",
                                             "do_refine"))
def _mcmc_post_step_jit(state: GSState, lr: float, cfg: SplatConfig,
                        mcfg: MCMCConfig, do_refine: bool) -> GSState:
    key, k1, k2 = jax.random.split(state.key, 3)
    params = state.params
    opt_state = state.opt_state
    n_alive = state.n_alive
    cap = params["means"].shape[0]

    if do_refine:
        n_target = grow_target(n_alive, cap, mcfg)
        params, relocated = relocate_dead(
            k1, params, _opacity_act(cfg), _scale_act(cfg),
            min_opacity=mcfg.min_opacity, n_alive=n_alive,
            n_target=n_target)
        n_alive = n_target

        # reset Adam moments of relocated slots
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
                                _opacity_act(cfg), _scale_act(cfg),
                                n_alive=n_alive)
    return GSState(params=params, opt_state=opt_state, step=state.step,
                   key=key, n_alive=n_alive)


def run_optim(state: GSState, gt_images: np.ndarray, w2c: np.ndarray,
              Ks: np.ndarray, iters: int, cfg: SplatConfig,
              enable_pruning: bool = False,
              mcfg: Optional[MCMCConfig] = None,
              verbose: bool = False,
              mesh=None) -> Tuple[GSState, List[float]]:
    """The reference's run_3dgs_optim loop (gs.py:97-166).

    mcfg defaults to the schedule in ``cfg`` (mcmc_* / cap_max knobs).
    mesh: optional jax Mesh — Gaussians (and Adam moments) are sharded over
    its first axis; cameras/GT replicate (SURVEY §2c splat row)."""
    from ..utils.profiling import trace_if
    if mcfg is None:
        mcfg = mcmc_config_from(cfg)
    if mesh is not None:
        from ..parallel import replicate, shard_gs_state
        state = shard_gs_state(state, mesh)
        gt_images = jax.device_put(jnp.asarray(gt_images, jnp.float32),
                                   replicate(mesh))
    gt = jnp.asarray(gt_images, jnp.float32)
    c, h, w = gt.shape[0], gt.shape[1], gt.shape[2]
    w2c_j = jnp.asarray(w2c, jnp.float32)
    ks_j = jnp.asarray(Ks, jnp.float32)
    cb = cfg.camera_batch if 0 < cfg.camera_batch < c else 0
    step0 = int(jax.device_get(state.step))
    cam_rng = np.random.default_rng(step0 + 1)
    # losses stay ON DEVICE until the end: a float() per step would block
    # the host on every dispatch and serialize the pipeline (the TPU can
    # otherwise run several queued steps ahead of the host)
    losses_dev: List[jnp.ndarray] = []
    trace_ctx = trace_if("splat_optim")
    trace_ctx.__enter__()
    trace_open = True
    rebin = max(int(cfg.rebin_every), 1)
    import dataclasses
    scfg = _autobudget_cfg(state, w2c_j, ks_j, w, h, cfg) \
        if cfg.auto_budget else cfg
    bins = None   # reused across steps when rebin > 1 (full-camera path)
    # drift-prior anchors: the seed positions (metric reconstruction);
    # refreshed after every MCMC relocation (relocated slots re-anchor at
    # their landing position). jnp.copy: the state is DONATED into the
    # jitted step — an aliased anchors buffer would be invalidated.
    anchors = (jnp.copy(state.params["means"])
               if cfg.loss_anchor_fac > 0.0 else None)
    for it in range(iters):
        if trace_open and it == 3:
            # trace only the first steps (compile + a few steady steps):
            # full-run traces are gigabytes and add per-step overhead
            trace_ctx.__exit__(None, None, None)
            trace_open = False
        if cb:
            # camera minibatches change the camera set every step — bins
            # cannot be reused across steps
            sel = jnp.asarray(cam_rng.choice(c, size=cb, replace=False))
            state, loss = train_step(state, gt[sel], w2c_j[sel], ks_j[sel],
                                     w, h, scfg, cb, anchors=anchors)
        else:
            if bins is None or it % rebin == 0:
                bins = compute_bins(state.params, w2c_j, ks_j, w, h, scfg,
                                    n_alive=state.n_alive)
                if cfg.auto_budget:
                    # grow a bucket (recompile) the moment the scene
                    # outgrows it — nothing is dropped below the ceilings
                    grown = scfg
                    if (int(jax.device_get(jnp.max(bins.n_clipped))) > 0
                            and scfg.max_tiles_per_gaussian
                            < cfg.max_tiles_per_gaussian):
                        grown = dataclasses.replace(
                            grown, max_tiles_per_gaussian=min(
                                scfg.max_tiles_per_gaussian * 2,
                                cfg.max_tiles_per_gaussian))
                    mc = int(jax.device_get(jnp.max(bins.max_count)))
                    if (mc > scfg.max_per_tile
                            and scfg.max_per_tile < cfg.max_per_tile):
                        grown = dataclasses.replace(
                            grown, max_per_tile=min(
                                _next_pow2(int(mc * 1.25) + 1),
                                cfg.max_per_tile))
                    if grown is not scfg:
                        scfg = grown
                        bins = compute_bins(state.params, w2c_j, ks_j, w,
                                            h, scfg,
                                            n_alive=state.n_alive)
            state, loss = train_step(state, gt, w2c_j, ks_j, w, h, scfg, c,
                                     bins=bins, anchors=anchors)
        if enable_pruning:
            step = step0 + it + 1   # == int(state.step), tracked host-side
            do_refine = (step >= mcfg.refine_start
                         and step < mcfg.refine_stop
                         and step % mcfg.refine_every == 0)
            # the MCMC position noise scales with the MEANS learning
            # rate (gsplat uses the means optimizer's current lr); using
            # the uniform cfg.lr when lr_means is much smaller made the
            # noise ~30x too strong and sent dying Gaussians roaming
            # (means drifted to |x| > 100 before NaN'ing projection math)
            mean_lr = cfg.lr_means if cfg.lr_means is not None else cfg.lr
            state = _mcmc_post_step(state, mean_lr, cfg, mcfg, do_refine)
            if do_refine:
                bins = None   # relocated Gaussians jump: force a rebin
                if anchors is not None:
                    anchors = jnp.copy(state.params["means"])
        losses_dev.append(loss)
        # note: verbose mode host-syncs (float()/int()) every 50 steps BY
        # DESIGN — the no-per-step-sync pipelining claim above holds for
        # the default verbose=False path only.
        if verbose and (it % 50 == 0 or it == iters - 1):
            print(f"[3dgs] step {step0 + it + 1} "
                  f"loss={float(loss):.4f} alive={int(state.n_alive)}")
    if trace_open:
        trace_ctx.__exit__(None, None, None)
    losses = [float(x) for x in jax.device_get(losses_dev)]
    return state, losses
