"""C++ host-runtime tests (csrc/starst3r_native.cpp via ctypes)."""

import numpy as np
import pytest

from starst3r_tpu import native
from starst3r_tpu.imaging import process_image

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (no g++?)")


def test_preprocess_matches_python(rng):
    img = rng.uniform(0, 255, size=(300, 400, 3)).astype(np.uint8)
    ref = process_image(img, size=224, crop_multiple=16)
    nat = native.preprocess(img, size=224, crop_mult=16)
    assert nat.shape == ref.shape
    # PIL quantizes the resize back to uint8 before normalize; the native
    # path keeps float precision — tolerance is one quantization step
    assert np.max(np.abs(nat - ref)) < (1.5 / 255.0) / 0.5


def test_preprocess_batch_threads(rng):
    imgs = [rng.uniform(0, 255, size=(120 + 8 * i, 160, 3)).astype(np.uint8)
            for i in range(6)]
    outs = native.preprocess_batch(imgs, size=96, crop_mult=16, n_threads=3)
    assert len(outs) == 6
    for im, out in zip(imgs, outs):
        ref = native.preprocess(im, size=96, crop_mult=16)
        np.testing.assert_array_equal(out, ref)


def test_preprocess_upscale(rng):
    img = rng.uniform(0, 255, size=(40, 60, 3)).astype(np.uint8)
    ref = process_image(img, size=128, crop_multiple=16)
    nat = native.preprocess(img, size=128, crop_mult=16)
    assert nat.shape == ref.shape
    assert np.max(np.abs(nat - ref)) < (2.0 / 255.0) / 0.5


def test_hash64_stable():
    a = native.hash64(b"hello")
    assert a == native.hash64(b"hello")
    assert a != native.hash64(b"hellp")
    assert native.hash64(b"hello", seed=1) != a


def test_rgb_to_u8(rng):
    x = rng.uniform(-0.2, 1.2, size=(17, 9, 3)).astype(np.float32)
    got = native.rgb_to_u8(x)
    want = np.clip(x * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_load_images_native_path(tmp_path, rng):
    from PIL import Image

    from starst3r_tpu.imaging import load_images
    p = []
    for i in range(3):
        f = tmp_path / f"{i}.png"
        Image.fromarray(
            rng.uniform(0, 255, size=(100, 140, 3)).astype(np.uint8)).save(f)
        p.append(str(f))
    nat = load_images(p, size=96, impl="native")
    ref = load_images(p, size=96, impl="pil")
    assert len(nat) == 3
    for a, b in zip(nat, ref):
        assert a.shape == b.shape
        assert np.max(np.abs(a - b)) < 0.02
