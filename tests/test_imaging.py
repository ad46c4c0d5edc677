import numpy as np
import pytest

from starst3r_tpu.imaging import (image_to_uint8, load_image,
                                  make_pair_indices,
                                  make_sliding_window_pairs, process_image)


def test_make_pair_indices_matches_reference_semantics():
    """Reference enumeration (starster/image.py:25-40): (i, j) with j < i
    first, then mirrored pairs appended."""
    assert make_pair_indices(3) == [(1, 0), (2, 0), (2, 1),
                                    (0, 1), (0, 2), (1, 2)]
    assert make_pair_indices(3, symmetric=False) == [(1, 0), (2, 0), (2, 1)]
    assert make_pair_indices(1) == []
    # complete symmetric digraph: n*(n-1) ordered pairs
    for n in (2, 4, 7):
        pairs = make_pair_indices(n)
        assert len(pairs) == n * (n - 1)
        assert len(set(pairs)) == len(pairs)


def test_sliding_window_pairs():
    pairs = make_sliding_window_pairs(5, window=2, symmetric=False)
    assert (1, 0) in pairs and (2, 0) in pairs
    assert (3, 0) not in pairs
    sym = make_sliding_window_pairs(5, window=2, symmetric=True)
    assert len(sym) == 2 * len(pairs)


def test_process_image_shapes(rng):
    img = (rng.uniform(size=(300, 400, 3)) * 255).astype(np.uint8)
    out = process_image(img, 224, crop_multiple=16)
    assert out.shape[0] == 3
    assert out.shape[1] % 16 == 0 and out.shape[2] % 16 == 0
    # longest edge resized to 224 then cropped down
    assert max(out.shape[1:]) <= 224
    assert out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_process_image_crop_multiple_8(rng):
    """compat mode: reference crops to multiples of 8 (image.py:60-71)."""
    img = (rng.uniform(size=(317, 211, 3)) * 255).astype(np.uint8)
    out = process_image(img, 224, crop_multiple=8)
    assert out.shape[1] % 8 == 0 and out.shape[2] % 8 == 0


def test_load_image_roundtrip(tmp_path, rng):
    from PIL import Image
    img = (rng.uniform(size=(64, 96, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    out = load_image(p, size=64)
    assert out.shape[0] == 3
    u8 = image_to_uint8(out)
    assert u8.dtype == np.uint8 and u8.shape[-1] == 3


def test_image_to_uint8_inverts_normalization(rng):
    img = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    norm = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    back = image_to_uint8(norm.transpose(2, 0, 1))
    np.testing.assert_array_equal(back, img)
