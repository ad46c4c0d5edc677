"""Ground-truth correctness of the Adam global alignment (VERDICT r1 #2).

Builds a synthetic multi-view scene with PLANTED camera poses and
geometrically consistent correspondences (all core points lie exactly on a
known world sphere — curved, so no planar SfM degeneracy), then requires
`run_global_alignment` to recover the trajectory after gauge (Umeyama)
alignment. The construction's only noise is core-grid snapping (~1px), so
the assertions are calibrated against the loss value AT the planted
configuration: a subtly wrong GA — sign error in a loss, chain composed
backwards, bad reparameterization — cannot reach that noise floor and
shifts the trajectory far beyond the ATE bound (identity-init ATE is ~70%
of trajectory scale; the bound is 12%).

The reference's de-facto spec is that this pipeline recovers real geometry
(reference: main.py:46-88); SURVEY §7.6 prescribes exactly this synthetic
planted-pose test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starst3r_tpu.alignment import ga as ga_mod
from starst3r_tpu.alignment.ga import run_global_alignment
from starst3r_tpu.config import GAConfig
from starst3r_tpu.utils.eval import ate_rmse, rpe_rotation_deg
from starst3r_tpu.utils.synthetic import synthetic_ga_scene

H = W = 128
F_GT = 180.0
SUB = 4
N_CAMS = 4


def _build_synthetic(focal_error: float = 0.0):
    data, mst, gt, _ = synthetic_ga_scene(
        n_cams=N_CAMS, hw=H, focal=F_GT, subsample=SUB,
        focal_error=focal_error)
    return data, mst, gt


def _loss3d_at_gt(data, mst, gt):
    """The 3D loss at the PLANTED configuration — the noise floor."""
    state = ga_mod.make_state(data, mst, GAConfig())
    K = np.array([[F_GT, 0, W / 2], [0, F_GT, H / 2], [0, 0, 1]])
    kj = jnp.asarray(np.tile(K[None], (N_CAMS, 1, 1)), jnp.float32)
    med = np.asarray(data.median_depths)
    depth = jnp.asarray(np.asarray(data.core_depth) * med[:, None])
    return float(ga_mod._loss_3d(kj, jnp.asarray(gt, jnp.float32), depth,
                                 state, 1.1, 0.0))


def _traj_scale(gt):
    return np.linalg.norm(gt[:, :3, 3] - gt[:, :3, 3].mean(0), axis=1).max()


def test_ga_recovers_planted_poses():
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst,
                                     GAConfig(niter1=300, niter2=120))
    pred = np.asarray(result.cam2w)
    assert np.all(np.isfinite(pred))
    ate = ate_rmse(pred, gt)
    assert ate < 0.12 * _traj_scale(gt), ate
    assert rpe_rotation_deg(pred, gt) < 8.0
    # the optimizer must reach the construction's noise floor: a sign error
    # or reversed chain plateaus at >> 1.5x the planted-config loss
    floor = _loss3d_at_gt(data, mst, gt)
    assert result.loss_coarse < 1.5 * floor, (result.loss_coarse, floor)


def test_ga_snap_free_reaches_sub_percent_ate():
    """With anchored continuous endpoints (zero construction noise — every
    correspondence residual is EXACTLY zero at the planted configuration),
    the GA must recover the trajectory to well under 1% ATE (VERDICT r2
    weak #2: proves the ~11% ATE of the snapped variant is the snapping
    noise floor, not an optimizer bound)."""
    data, mst, gt, _ = synthetic_ga_scene(
        n_cams=N_CAMS, hw=H, focal=F_GT, subsample=SUB, snap_free=True)
    # exactness of the construction: loss at the planted config is float32
    # roundoff (~1e-7), orders below the snapped variant's ~1e-2 floor
    floor = _loss3d_at_gt(data, mst, gt)
    assert floor < 1e-5, floor
    # phase 1 (the 3D geometry solver) at reference hyperparameters must
    # land essentially ON the planted trajectory
    r1, _ = run_global_alignment(data, mst, GAConfig(niter1=500, niter2=0))
    ate1 = ate_rmse(np.asarray(r1.cam2w), gt)
    assert ate1 < 0.001 * _traj_scale(gt), ate1
    # the full two-phase pipeline: phase 2's Adam wanders around the exact
    # minimum at lr2 scale (at a zero-residual optimum Adam's normalized
    # steps are lr-sized noise — same behavior as the reference optimizer,
    # harmless on real data whose residual floor dwarfs it). At a lr2 small
    # vs that wander scale the full pipeline is sub-0.5%:
    result, _ = run_global_alignment(
        data, mst, GAConfig(niter1=500, niter2=200, lr2=0.004))
    pred = np.asarray(result.cam2w)
    ate = ate_rmse(pred, gt)
    assert ate < 0.005 * _traj_scale(gt), (ate, _traj_scale(gt))
    assert rpe_rotation_deg(pred, gt) < 0.5


def test_ga_ate_tracks_snapping_noise():
    """ATE must shrink as the snapping quantum shrinks (subsample 4 -> 2):
    direct evidence the residual error is construction noise."""
    ates = []
    for sub in (4, 2):
        data, mst, gt, _ = synthetic_ga_scene(
            n_cams=N_CAMS, hw=H, focal=F_GT, subsample=sub)
        result, _ = run_global_alignment(data, mst,
                                         GAConfig(niter1=300, niter2=120))
        ates.append(ate_rmse(np.asarray(result.cam2w), gt)
                    / _traj_scale(gt))
    assert ates[1] < 0.75 * ates[0], ates


def test_ga_canary_identity_init_fails_bound():
    """The tolerance actually separates solved from unsolved: the initial
    (identity-chain) poses must NOT pass the ATE bound."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst, GAConfig(niter1=0, niter2=0))
    pred = np.asarray(result.cam2w)
    assert ate_rmse(pred, gt) > 0.12 * _traj_scale(gt)


def test_ga_shared_intrinsics():
    """shared_intrinsics=True (reference reconstruct.py:67) must produce ONE
    K for all cameras and still recover the planted trajectory (the
    synthetic scene genuinely shares its intrinsics)."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(
        data, mst, GAConfig(niter1=300, niter2=120, shared_intrinsics=True))
    K = np.asarray(result.K)
    np.testing.assert_allclose(K, np.broadcast_to(K[:1], K.shape), atol=1e-4)
    pred = np.asarray(result.cam2w)
    assert ate_rmse(pred, gt) < 0.12 * _traj_scale(gt)


def test_ga_focal_stays_stable():
    """Phase 2 optimizes log-focals. Focal is only weakly observable in this
    parameterization (the reparameterized depth scales with focal — same as
    the reference, reconstruct.py:224-226), so full recovery from a wrong
    prior is not expected; what MUST hold is that correct base focals stay
    near truth while poses converge (the ~1px snap noise drifts them by up
    to ~15% — focal/depth trade off near-freely here) — a sign error in the
    focal path runs them to the clamp bounds (0.25x image diagonal = 45px,
    10x = 1810px), far outside the 25% band asserted."""
    data, mst, gt = _build_synthetic()
    result, _ = run_global_alignment(data, mst,
                                     GAConfig(niter1=300, niter2=200))
    rec_f = np.asarray(result.K)[:, 0, 0]
    rel = np.abs(rec_f - F_GT) / F_GT
    assert rel.max() < 0.25, rec_f


def test_ga_exp_depth_recovers_planted_poses():
    """exp_depth=True (reference reconstruct.py:122,249-250,274-275):
    core depth is optimized in log space. The parameterization change must
    (a) keep the recovered trajectory within the same ATE bound and
    (b) produce the same metric depth surface at init (round-trip
    exp(log(d)) == d)."""
    data, mst, gt = _build_synthetic()
    cfg = GAConfig(niter1=400, niter2=200, exp_depth=True, opt_depth=True)
    result, params = run_global_alignment(data, mst, cfg)
    pred = np.asarray(result.cam2w)
    # opt_depth=True lets depth absorb snap noise, so the bound is looser
    # than the pose-only tests' 12% (linear-depth opt_depth=True lands in
    # the same band)
    assert ate_rmse(pred, gt) < 0.15 * _traj_scale(gt)
    # params hold log-depth (strictly, exp(params) must be positive finite)
    d = np.exp(np.asarray(params.core_depth))
    assert np.all(np.isfinite(d)) and np.all(d > 0)


def test_ga_exp_depth_init_roundtrip():
    """At zero iterations the exp_depth parameterization must reproduce the
    exact same depth output as the linear one (exp(log(d)) == d up to f32)."""
    data, mst, gt = _build_synthetic()
    r_lin, _ = run_global_alignment(data, mst, GAConfig(niter1=0, niter2=0))
    r_exp, _ = run_global_alignment(data, mst, GAConfig(niter1=0, niter2=0,
                                                        exp_depth=True))
    np.testing.assert_allclose(np.asarray(r_exp.depth),
                               np.asarray(r_lin.depth), rtol=2e-6)


def test_ga_anchored_beats_snapped():
    """The PRODUCT anchor path (integer-pixel refined endpoints anchored to
    core cells — synthetic model of ops.matching.refine_matches) must
    substantially beat grid-snapped endpoints (VERDICT r3 #4: default-path
    ATE was dominated by the snap quantum)."""
    cfg = GAConfig(niter1=500, niter2=200, lr2=0.004)
    data_s, mst, gt, _ = synthetic_ga_scene(n_cams=N_CAMS, hw=H,
                                            subsample=SUB)
    res_s, _ = run_global_alignment(data_s, mst, cfg)
    data_a, mst, gt, _ = synthetic_ga_scene(n_cams=N_CAMS, hw=H,
                                            subsample=SUB, anchored=True)
    res_a, _ = run_global_alignment(data_a, mst, cfg)
    ate_s = ate_rmse(np.asarray(res_s.cam2w), gt)
    ate_a = ate_rmse(np.asarray(res_a.cam2w), gt)
    assert ate_a < 0.5 * ate_s, (ate_a, ate_s)
    assert ate_a < 0.05 * _traj_scale(gt), ate_a


def test_factored_onehot_colsum_matches_scatter():
    """The big-R depth-gather backward (ADVICE r4 medium: dense (M, R)
    one-hot OOMs at 512px GA scale) — the factored two-level contraction
    must equal a plain scatter-add."""
    import jax.numpy as jnp

    from starst3r_tpu.alignment.ga import _factored_onehot_colsum

    rng = np.random.default_rng(3)
    m, r = 5000, 737                      # r deliberately not a power of 2
    idx = jnp.asarray(rng.integers(0, r, size=m), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(m, 1)).astype(np.float32))
    got = np.asarray(_factored_onehot_colsum(idx, ct, r))
    want = np.zeros((r, 1), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(ct))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="512px-scale GA memory proof needs real TPU HBM")
def test_ga_512px_scale_memory():
    """The checkpoint-native 512px GA operating point (10 cams, S=4096
    core cells, ~370k anchored correspondences) must fit a 16 GB chip:
    the depth-gather backward's dense one-hot would be ~60 GB here —
    ADVICE r4 medium — so this exercises the factored two-level path at
    the exact scale the dense form OOMs. Run by the TPU verify flow;
    measured full-length GA converges to ATE 0.5% of trajectory in ~70 s."""
    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.config import GAConfig
    from starst3r_tpu.utils.synthetic import synthetic_ga_scene

    data, mst, gt, _ = synthetic_ga_scene(
        n_cams=10, hw=512, focal=720.0, subsample=8, anchored=True,
        orbit=True, sph_r=1.2, spread=0.2)
    res, _ = run_global_alignment(
        data, mst, GAConfig(niter1=50, niter2=20, jit_chunk=10))
    assert np.all(np.isfinite(np.asarray(res.cam2w)))
