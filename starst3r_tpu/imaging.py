"""Image loading and preprocessing.

Behavioral spec (reference: starster/image.py:25-139):
  - load with PIL, EXIF-transpose, convert RGB
  - bicubic resize so the longest edge == ``size``
  - center-crop H and W down to a multiple of ``crop_multiple``
    (reference uses 8; we default to the ViT patch size 16 so tokens need no
    padding — set crop_multiple=8 for bit-compat with the reference crop)
  - normalize mean/std = 0.5  =>  x in [-1, 1]

TPU-first notes: all preprocessing is host-side numpy/PIL (tiny work), the
normalized array ships to device once per image. Images are CHW float32 like
the reference; batching into fixed-resolution buckets happens in
`reconstruct` so every jit sees static shapes.

The pair-index helper reproduces `make_pair_indices`
(reference: starster/image.py:25-40) including its ordering, and adds the
sliding-window graph for video/keyframe configs (SURVEY §2b "Pair graph
builder" row).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np
from PIL import Image
from PIL.ImageOps import exif_transpose

__all__ = (
    "make_pair_indices",
    "make_sliding_window_pairs",
    "process_image",
    "load_image",
    "load_images",
    "image_to_uint8",
)


def make_pair_indices(n: int, symmetric: bool = True) -> List[Tuple[int, int]]:
    """All pairs for ``n`` images — complete graph.

    Matches the reference's enumeration order exactly (starster/image.py:25-40):
    first all (i, j) with j < i, then, if symmetric, their mirrors appended in
    the same order. The symmetric set equals dust3r
    ``make_pairs(scene_graph="complete", symmetrize=True)`` as consumed at
    reference reconstruct.py:52.
    """
    pairs: List[Tuple[int, int]] = []
    for i in range(n):
        for j in range(i):
            pairs.append((i, j))
    if symmetric:
        pairs = pairs + [(j, i) for (i, j) in pairs]
    return pairs


def make_sliding_window_pairs(n: int, window: int = 3,
                              symmetric: bool = True) -> List[Tuple[int, int]]:
    """Sliding-window pair graph for video/keyframe sequences: (i, j) for
    0 < i - j <= window. Keeps the pair count O(n·window) instead of O(n²)
    (SURVEY §2b pair-graph row: "sliding-window/keyframe graphs for the video
    configs")."""
    pairs = []
    for i in range(n):
        for j in range(max(0, i - window), i):
            pairs.append((i, j))
    if symmetric:
        pairs = pairs + [(j, i) for (i, j) in pairs]
    return pairs


def _resize_bicubic(img: np.ndarray, new_hw: Tuple[int, int]) -> np.ndarray:
    """Bicubic resize of an HWC uint8/float image via PIL (host-side)."""
    h, w = new_hw
    if img.dtype != np.uint8:
        arr = np.clip(img, 0.0, 1.0)
        arr = (arr * 255.0 + 0.5).astype(np.uint8)
    else:
        arr = img
    pil = Image.fromarray(arr)
    pil = pil.resize((w, h), Image.BICUBIC)
    return np.asarray(pil)


def process_image(img: np.ndarray, size: int,
                  crop_multiple: int = 16,
                  mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """Preprocess one image to pipeline requirements.

    Parameters
    ----------
    img: (H, W, 3) uint8 (or float in [0,1]) RGB image.
    size: longest edge is resized to this (bicubic).
    crop_multiple: center-crop H and W to a multiple of this.

    Returns
    -------
    (3, H', W') float32, normalized to [-1, 1] — same layout/normalization as
    the reference (starster/image.py:43-78).
    """
    h, w = img.shape[:2]
    scale = size / max(h, w)
    new_h, new_w = int(h * scale), int(w * scale)
    img = _resize_bicubic(img, (new_h, new_w))

    cy, cx = new_h // 2, new_w // 2
    hh = (cy // crop_multiple) * crop_multiple
    wh = (cx // crop_multiple) * crop_multiple
    img = img[cy - hh: cy + hh, cx - wh: cx + wh]

    arr = img.astype(np.float32) / 255.0
    arr = (arr - mean) / std
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def load_image(path: Union[str, Path], size: int = 224,
               crop_multiple: int = 16) -> np.ndarray:
    """Load + preprocess one image file (reference: starster/image.py:81-103).

    Returns (3, H, W) float32 in [-1, 1].
    """
    img = Image.open(path)
    img = exif_transpose(img)
    img = img.convert("RGB")
    return process_image(np.asarray(img), size, crop_multiple=crop_multiple)


def load_images(paths: Sequence[Union[str, Path]], size: int = 224,
                crop_multiple: int = 16,
                impl: str = "auto") -> List[np.ndarray]:
    """Load a list of files (reference: starster/image.py:105-110).

    impl: 'native' uses the C++ threaded preprocessing pipeline
    (csrc/starst3r_native.cpp) — decode on the Python side, resize/crop/
    normalize on a thread pool; 'pil' is the pure-Python path; 'auto'
    prefers native when the library is built.
    """
    if impl == "auto":
        from . import native
        impl = "native" if native.available() else "pil"
    if impl == "native":
        from . import native
        raws = []
        for p in paths:
            img = exif_transpose(Image.open(p)).convert("RGB")
            raws.append(np.asarray(img))
        return native.preprocess_batch(raws, size, crop_mult=crop_multiple)
    return [load_image(p, size, crop_multiple=crop_multiple) for p in paths]


def image_to_uint8(img: np.ndarray, mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """Invert the normalization: (3,H,W) or (H,W,3) float -> (H,W,3) uint8."""
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] == 3:
        arr = arr.transpose(1, 2, 0)
    arr = arr * std + mean
    return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
