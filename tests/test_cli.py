"""CLI + checkpoint round-trip tests (app layer, SURVEY §7.2 layer 9)."""

import os

import numpy as np
import pytest
from PIL import Image

import starst3r_tpu as st
from starst3r_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.uniform(0, 255, size=(48, 48, 3))).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im_{i}.png")
    return str(d)


@pytest.fixture(scope="module")
def recon_out(imgdir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    rc = cli_main(["reconstruct", "--imgdir", imgdir, "--out", out,
                   "--res", "48", "--preset", "tiny",
                   "--ga-iters1", "4", "--ga-iters2", "2",
                   "--gs-iters", "2"])
    assert rc == 0
    return out


def test_reconstruct_outputs(recon_out):
    for f in ("scene.ckpt", "points.ply", "c2w.npy", "intrinsics.npy",
              "metrics.jsonl"):
        assert os.path.exists(os.path.join(recon_out, f)), f
    pts, cols = st.io.ply.load_ply(os.path.join(recon_out, "points.ply"))
    assert pts.shape[1] == 3 and cols is not None
    assert np.all(np.isfinite(pts))


def test_scene_checkpoint_roundtrip(recon_out):
    scene = st.Scene.load(os.path.join(recon_out, "scene.ckpt"))
    assert scene.c2w.shape[0] == 3
    assert scene.gs_state is not None
    assert len(scene.imgs) == 3
    # continue training from the restored state
    losses = scene.run_3dgs_optim(2, enable_pruning=False)
    assert np.all(np.isfinite(losses))


def test_render_path(recon_out, tmp_path):
    frames = str(tmp_path / "frames")
    rc = cli_main(["render-path", "--scene",
                   os.path.join(recon_out, "scene.ckpt"),
                   "--out", frames, "--steps", "4"])
    assert rc == 0
    pngs = [f for f in os.listdir(frames) if f.endswith(".png")]
    assert len(pngs) >= 4
    im = np.asarray(Image.open(os.path.join(frames, sorted(pngs)[0])))
    scene = st.Scene.load(os.path.join(recon_out, "scene.ckpt"))
    assert im.shape == scene.imgs[0].shape  # native processed resolution


def test_export_ply(recon_out, tmp_path):
    out = str(tmp_path / "g.ply")
    rc = cli_main(["export-ply", "--scene",
                   os.path.join(recon_out, "scene.ckpt"), "--out", out])
    assert rc == 0
    pts, cols = st.io.ply.load_ply(out)
    assert pts.shape[1] == 3


def test_train_gs_cli(recon_out, tmp_path):
    out = str(tmp_path / "gs2")
    rc = cli_main(["train-gs", "--scene",
                   os.path.join(recon_out, "scene.ckpt"),
                   "--out", out, "--iters", "2", "--no-pruning"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "scene.ckpt"))


def test_reconstruct_rejects_too_few_images(tmp_path):
    d = tmp_path / "one"
    d.mkdir()
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(d / "x.png")
    rc = cli_main(["reconstruct", "--imgdir", str(d),
                   "--out", str(tmp_path / "o"), "--preset", "tiny"])
    assert rc == 2


def test_info_runs(capsys):
    assert cli_main(["info"]) == 0
    out = capsys.readouterr().out
    assert "devices" in out
