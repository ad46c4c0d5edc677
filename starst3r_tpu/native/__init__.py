"""ctypes bindings + build glue for the C++ host runtime (csrc/).

The device compute path is JAX/XLA/Pallas; this module provides the native
host runtime around it — the role CUDA-extension glue plays in the reference
stack (SURVEY §2b L0 row): image preprocessing, a threaded batch loader,
and fast content hashing for the pair cache.

Usage: `native.available()` (builds on first call when a toolchain exists);
all callers fall back to the pure-Python implementations when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ("available", "build", "preprocess", "preprocess_batch", "hash64",
           "rgb_to_u8")

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "starst3r_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_LIB = os.path.join(_LIB_DIR, "libstarst3r_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library (g++ -O3). Returns success."""
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_LIB) and not force and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return True
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return res.returncode == 0 and os.path.exists(_LIB)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.st_preprocess_shape.argtypes = [ctypes.c_int] * 4 + [i32p, i32p]
        lib.st_preprocess_shape.restype = ctypes.c_int
        lib.st_preprocess.argtypes = [u8p] + [ctypes.c_int] * 4 + \
            [ctypes.c_float, ctypes.c_float, f32p]
        lib.st_preprocess.restype = ctypes.c_int
        lib.st_preprocess_batch.argtypes = [
            ctypes.POINTER(u8p), i32p, i32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(f32p), ctypes.c_int]
        lib.st_preprocess_batch.restype = ctypes.c_int
        lib.st_hash64.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64]
        lib.st_hash64.restype = ctypes.c_uint64
        lib.st_rgb_to_u8.argtypes = [f32p, ctypes.c_int, u8p]
        lib.st_rgb_to_u8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def output_shape(h: int, w: int, size: int, crop_mult: int) -> Tuple[int, int]:
    lib = _load()
    assert lib is not None
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    rc = lib.st_preprocess_shape(h, w, size, crop_mult,
                                 ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        raise ValueError(f"image {h}x{w} too small for size={size}, "
                         f"crop_mult={crop_mult}")
    return oh.value, ow.value


def preprocess(img: np.ndarray, size: int, crop_mult: int = 16,
               mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """HWC uint8 RGB -> (3, H', W') float32 normalized (native path)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    oh, ow = output_shape(h, w, size, crop_mult)
    out = np.empty((3, oh, ow), np.float32)
    rc = lib.st_preprocess(_u8ptr(img), h, w, size, crop_mult,
                           mean, std, _f32ptr(out))
    if rc != 0:
        raise ValueError("preprocess failed")
    return out


def preprocess_batch(imgs: Sequence[np.ndarray], size: int,
                     crop_mult: int = 16, mean: float = 0.5,
                     std: float = 0.5,
                     n_threads: int = 0) -> List[np.ndarray]:
    """Threaded batch preprocess — the data-loader hot path."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    n = len(imgs)
    outs = []
    hs = np.array([im.shape[0] for im in imgs], np.int32)
    ws = np.array([im.shape[1] for im in imgs], np.int32)
    for im in imgs:
        oh, ow = output_shape(im.shape[0], im.shape[1], size, crop_mult)
        outs.append(np.empty((3, oh, ow), np.float32))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    img_ptrs = (u8p * n)(*[_u8ptr(im) for im in imgs])
    out_ptrs = (f32p * n)(*[_f32ptr(o) for o in outs])
    fails = lib.st_preprocess_batch(
        img_ptrs, hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n, size, crop_mult,
        mean, std, out_ptrs, n_threads)
    if fails:
        raise ValueError(f"{fails} images failed preprocessing")
    return outs


def hash64(data: bytes | np.ndarray, seed: int = 0) -> int:
    lib = _load()
    assert lib is not None
    if isinstance(data, np.ndarray):
        data = np.ascontiguousarray(data).tobytes()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    return int(lib.st_hash64(ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
                             len(data), seed))


def rgb_to_u8(rgb: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    rgb = np.ascontiguousarray(rgb, np.float32)
    out = np.empty(rgb.shape, np.uint8)
    lib.st_rgb_to_u8(_f32ptr(rgb), rgb.size, _u8ptr(out))
    return out
