"""End-to-end integration tests (BASELINE configs 1-3 at tiny scale on CPU).

Mirrors the reference's only executable test, main.py (SURVEY §3.3): load
images -> incremental add_images (warm-start path) -> init_3dgs ->
run_3dgs_optim with and without pruning -> render all views.
"""

import dataclasses

import numpy as np
import pytest

import starst3r_tpu as st


@pytest.fixture(scope="module")
def tiny_model():
    return st.Mast3rModel.init_random(st.ModelConfig.tiny(), image_hw=(64, 64))


@pytest.fixture(scope="module")
def fast_cfg():
    cfg = st.default_config()
    return dataclasses.replace(
        cfg, ga=dataclasses.replace(cfg.ga, niter1=15, niter2=8))


def _images(n, rng, hw=(64, 64)):
    return [rng.uniform(-1, 1, size=(3, *hw)).astype(np.float32)
            for _ in range(n)]


@pytest.mark.parametrize("mode", ["lm", "schur"])
def test_reconstruct_with_lm_refine(tiny_model, fast_cfg, rng, mode):
    """--refine-lm wiring (both modes): post-GA polish runs in the
    pipeline, returns valid SE(3) poses, and reports decreasing cost."""
    from starst3r_tpu.utils.metrics import MetricsLogger
    cfg = dataclasses.replace(
        fast_cfg, ga=dataclasses.replace(fast_cfg.ga, refine_lm=True,
                                         lm_iters=4, lm_mode=mode))
    imgs = _images(3, rng)
    logger = MetricsLogger()
    rec, _ = st.reconstruct_scene(tiny_model, imgs, config=cfg,
                                  logger=logger)
    assert np.all(np.isfinite(rec.cam2w))
    R = rec.cam2w[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (3, 1, 1)), atol=1e-3)
    lm_recs = [r for r in logger.records if r["event"] == "lm_refine"]
    assert len(lm_recs) == 1
    assert lm_recs[0]["cost_last"] <= lm_recs[0]["cost_first"] + 1e-6


def test_two_image_pair_reconstruction(tiny_model, fast_cfg, rng):
    """BASELINE config 1: 2 images, tiny ViT, pairwise alignment, CPU."""
    imgs = _images(2, rng)
    rec, params = st.reconstruct_scene(tiny_model, imgs, config=fast_cfg)
    assert rec.cam2w.shape == (2, 4, 4)
    assert rec.intrinsics.shape == (2, 3, 3)
    assert np.all(np.isfinite(rec.cam2w))
    # cam2w must be valid SE3
    R = rec.cam2w[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (2, 1, 1)), atol=1e-3)
    pts, depths, confs = rec.get_dense_pts3d(clean_depth=True)
    assert pts[0].shape == (64 * 64, 3)
    assert np.all(np.isfinite(pts[0]))


def test_incremental_add_images_warm_start(tiny_model, fast_cfg, rng):
    """The SLAM warm-start path (reference reconstruct.py:408-415 /
    main.py:49-50)."""
    imgs = _images(3, rng)
    scene = st.Scene(config=fast_cfg)
    scene.add_images(tiny_model, imgs[:2])
    p0 = scene.optim_params
    c2w_before = scene.c2w.copy()
    assert scene.c2w.shape == (2, 4, 4)
    scene.add_images(tiny_model, imgs[2:])
    assert scene.c2w.shape == (3, 4, 4)
    assert scene.optim_params is not None
    assert p0.quats.shape[0] == 2 and scene.optim_params.quats.shape[0] == 3
    assert len(scene.imgs) == 3
    assert len(scene.dense_pts) == 3


def test_full_pipeline_with_3dgs(tiny_model, fast_cfg, rng):
    """Configs 2-3 shrunk: reconstruct -> 3DGS optim (pruning on then off)
    -> render, like main.py:80-88."""
    imgs = _images(2, rng)
    scene = st.Scene(config=fast_cfg)
    scene.add_images(tiny_model, imgs, conf_thres=1.5)
    if scene.dense_pts_flat.shape[0] == 0:
        # a random-init net can yield zero points above the product conf
        # threshold; re-threshold at 0 instead of skipping (VERDICT r3
        # weak #8: this is the only end-to-end reconstruct->splat test and
        # must not silently drop out on a seed change). conf is strictly
        # positive (1 + exp path), so thres 0 keeps every pixel.
        scene.add_images(tiny_model, [], conf_thres=0.0)
        assert scene.dense_pts_flat.shape[0] > 0
    scene.init_3dgs()
    l1 = scene.run_3dgs_optim(4, enable_pruning=True)
    l2 = scene.run_3dgs_optim(2, enable_pruning=False)
    assert len(l1) == 4 and len(l2) == 2
    assert all(np.isfinite(l) for l in l1 + l2)
    # loss should decrease over the first steps
    assert l2[-1] < l1[0]
    rgb, alpha, info = scene.render_3dgs_original(64, 64)
    assert rgb.shape == (2, 64, 64, 3)
    assert alpha.shape == (2, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(rgb)))
    # novel view rendering from an interpolated path (utils.py:57-78 analog)
    path = st.interp_se3_path(scene.c2w[0], scene.c2w[1], 3)
    import jax.numpy as jnp
    from starst3r_tpu.utils.se3 import se3_inverse
    w2c_path = np.asarray(se3_inverse(jnp.asarray(path)))
    Ks = np.tile(scene.intrinsics[:1], (3, 1, 1))
    rgb2, _, _ = scene.render_3dgs(w2c_path, Ks, 64, 64)
    assert rgb2.shape == (3, 64, 64, 3)


def test_pair_cache_hits(tiny_model, fast_cfg, rng, tmp_path):
    """Re-running with the same cache dir must not re-infer
    (reference disk-cache semantics, scene.py:60-62)."""
    imgs = _images(2, rng)
    cache = str(tmp_path / "cache")
    rec1, _ = st.reconstruct_scene(tiny_model, imgs, tmpdir=cache,
                                   config=fast_cfg)
    import os
    files = set(os.listdir(cache))
    assert len(files) == 2  # two ordered pairs

    calls = {"n": 0}
    orig = tiny_model.infer_pairs

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    tiny_model.infer_pairs = counted
    try:
        rec2, _ = st.reconstruct_scene(tiny_model, imgs, tmpdir=cache,
                                       config=fast_cfg)
    finally:
        tiny_model.infer_pairs = orig
    assert calls["n"] == 0
    np.testing.assert_allclose(rec1.cam2w, rec2.cam2w, atol=1e-4)


def test_crash_resume_from_checkpoint(tiny_model, fast_cfg, rng, tmp_path):
    """Failure-recovery story (SURVEY §5 failure-detection row): a run that
    dies after a checkpoint resumes from disk — Scene.load restores poses +
    GA warm-start params + GT images bit-exactly, the pair cache is reused
    (no re-inference of completed pairs), and the pipeline continues with
    add_images exactly like the uninterrupted warm-start path."""
    cache_dir = str(tmp_path / "cache")
    ckpt = str(tmp_path / "scene.ckpt")
    imgs = _images(3, rng)

    scene = st.Scene(cache_dir=cache_dir, config=fast_cfg)
    scene.add_images(tiny_model, imgs[:2])
    p_before = scene.optim_params
    c2w_before = scene.c2w.copy()
    scene.save(ckpt)
    del scene  # "crash"

    resumed = st.Scene.load(ckpt, cache_dir=cache_dir, config=fast_cfg)
    # bit-exact state restore
    np.testing.assert_array_equal(resumed.c2w, c2w_before)
    assert resumed.optim_params is not None
    np.testing.assert_array_equal(np.asarray(resumed.optim_params.quats),
                                  np.asarray(p_before.quats))
    np.testing.assert_array_equal(resumed.raw_imgs[0], imgs[0])

    # continuing re-infers only the new pair frontier: the 2 symmetric
    # pairs of the first call are already on disk as cache entries
    import glob
    import os
    n_cached = len(glob.glob(os.path.join(cache_dir, "*")))
    assert n_cached >= 2
    resumed.add_images(tiny_model, imgs[2:])
    assert resumed.c2w.shape == (3, 4, 4)
    assert np.all(np.isfinite(resumed.c2w))
    assert resumed.optim_params.quats.shape[0] == 3


def test_reconstruct_with_lora_depth(tiny_model, fast_cfg, rng):
    """--lora-depth wiring: the pipeline builds the spectral basis from the
    input images, the GA optimizes coefficients, and the reconstruction
    still produces valid dense geometry."""
    cfg = dataclasses.replace(
        fast_cfg, ga=dataclasses.replace(fast_cfg.ga, lora_depth=True,
                                         lora_k=16, opt_depth=True))
    imgs = _images(3, rng)
    rec, params = st.reconstruct_scene(tiny_model, imgs, config=cfg)
    assert params.core_depth.shape == (3, 16)     # coefficients, not dense
    assert np.all(np.isfinite(rec.cam2w))
    assert np.all(np.isfinite(rec.core_depth))   # expanded dense core depth
    assert rec.core_depth.shape[0] == 3 and rec.core_depth.shape[1] > 16


def test_e2e_image_quality_gate(rng):
    """End-to-end image-space quality gate (VERDICT r3 #7; BASELINE.md
    "novel-view PSNR"): GA on exact synthetic data -> 3DGS trained against
    the rendered images ON THE RECOVERED poses -> held-out-view PSNR must
    clearly beat the init render. The network is bypassed (the gate
    measures the geometry + splat pipeline, not a random-init checkpoint;
    reference de-facto spec main.py:46-88). bench.py runs the same gate at
    128px/subsample-2 scale and records `e2e_psnr`."""
    import jax.numpy as jnp

    from starst3r_tpu.alignment.ga import run_global_alignment
    from starst3r_tpu.config import GAConfig, SplatConfig
    from starst3r_tpu.ops.ssim import psnr as psnr_fn
    from starst3r_tpu.splat.train import init_gaussians, render, run_optim
    from starst3r_tpu.utils.synthetic import synthetic_image_scene

    data, mst, _gt, _K, imgs, hit = synthetic_image_scene(
        n_cams=5, hw=64, subsample=4, focal=90.0)
    res, _ = run_global_alignment(
        data, mst, GAConfig(niter1=300, niter2=100, lr2=0.004))
    hold = 2
    tc = [i for i in range(5) if i != hold]
    cp = np.asarray(data.core_pix).astype(np.int64)
    # seed Gaussians the product way: confidence-filtered points (here the
    # exact hit mask — cells whose ray misses the surface carry garbage
    # depth and would plant occluding background splats), per-point init
    # scale = local grid spacing depth*subsample/focal from the RECOVERED
    # depth, fixed (non-compat) activations, per-param lrs.
    m = hit[tc].reshape(-1)
    pts = np.asarray(res.pts3d)[tc].reshape(-1, 3)[m]
    cols = np.stack([imgs[i][cp[:, 1], cp[:, 0]]
                     for i in tc]).reshape(-1, 3)[m]
    scales = (np.asarray(res.depth)[tc].reshape(-1)[m] * 4
              / np.asarray(res.K)[tc, 0, 0].repeat(
                  data.core_pix.shape[0])[m])
    cfg = dataclasses.replace(
        SplatConfig(rebin_every=4), pool_headroom=0.0,
        compat_inverted_sh=False, compat_raw_activations=False,
        lr_means=5e-4, lr_quats=1e-3, lr_scales=5e-3, lr_opacities=5e-2,
        lr_sh=2.5e-3)
    state = init_gaussians(pts, cols, cfg, point_scales=scales)
    w2c = np.asarray(res.w2c)
    Ks = np.asarray(res.K)
    r0 = jnp.clip(render(state.params, w2c[hold:hold + 1],
                         Ks[hold:hold + 1], 64, 64, cfg)[0][0], 0, 1)
    p0 = float(psnr_fn(jnp.asarray(imgs[hold]), r0))
    state, losses = run_optim(state, imgs[tc], w2c[tc], Ks[tc], 200, cfg)
    r1 = jnp.clip(render(state.params, w2c[hold:hold + 1],
                         Ks[hold:hold + 1], 64, 64, cfg,
                         n_alive=state.n_alive)[0][0], 0, 1)
    p1 = float(psnr_fn(jnp.asarray(imgs[hold]), r1))
    assert losses[-1] < losses[0]
    assert p1 > p0 + 2.0, (p0, p1)
    assert p1 > 13.0, p1


def test_register_camera_freezes_existing(tiny_model, fast_cfg, rng):
    """`Scene.register_camera`: localize ONE new image against a frozen
    reconstruction — existing relative pose parameters must not move
    (the held-out-camera registration primitive, VERDICT r4 #1)."""
    imgs = _images(4, rng)
    scene = st.Scene(config=fast_cfg)
    scene.add_images(tiny_model, imgs[:3])
    p_before = scene.optim_params
    c2w_new = scene.register_camera(tiny_model, imgs[3])
    assert c2w_new.shape == (4, 4)
    assert scene.c2w.shape == (4, 4, 4)
    assert len(scene.dense_pts) == 4
    # frozen cameras' chain parameters unchanged (up to the per-step quat
    # renormalization's float rounding, reference reconstruct.py:394-395)
    np.testing.assert_allclose(
        np.asarray(p_before.quats), np.asarray(scene.optim_params.quats[:3]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_before.trans), np.asarray(scene.optim_params.trans[:3]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_before.core_depth),
        np.asarray(scene.optim_params.core_depth[:3]), atol=1e-6)


def test_init_3dgs_adaptive_scales(tiny_model, fast_cfg, rng):
    """Scene.init_3dgs(adaptive_scales=True) seeds each splat at its local
    point spacing depth/focal (the quality recipe) — per-point, positive,
    and consistent with the stored dense depths."""
    imgs = _images(2, rng)
    scene = st.Scene(config=fast_cfg)
    scene.add_images(tiny_model, imgs, conf_thres=0.0)
    assert len(scene.dense_scales) == 2
    assert all(s.shape[0] == p.shape[0]
               for s, p in zip(scene.dense_scales, scene.dense_pts))
    state = scene.init_3dgs(adaptive_scales=True)
    n = scene.dense_pts_flat.shape[0]
    got = np.asarray(state.params["scales"][:n, 0])
    want = np.concatenate(scene.dense_scales)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert np.all(want > 0)
