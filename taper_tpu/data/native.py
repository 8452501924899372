"""ctypes binding for the native (C++) data pipeline.

Loads ``native/libtaperdata.so`` (built by ``make -C native``; built on
demand here if g++ is available).  Every entry point has a pure-NumPy
fallback, so the library is optional — but with it, IDX parsing, batch
gather and synthetic rendering run multithreaded in C++ (the role rayon
plays in the reference's ``src/data/mnist.rs``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtaperdata.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.taper_render_synthetic.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float)]
        lib.taper_parse_idx_images.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.taper_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.taper_shuffle_indices.argtypes = [
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.taper_bpe_train.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.taper_bpe_train.restype = ctypes.c_int64
        lib.taper_bpe_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.taper_bpe_encode.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def render_synthetic(labels: np.ndarray, seed: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    out = np.empty((len(labels), 784), np.float32)
    lib.taper_render_synthetic(_i32p(labels), len(labels),
                               ctypes.c_uint64(seed), _f32p(out))
    return out


def parse_idx_pixels(pixels: np.ndarray, n: int, dim: int
                     ) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    pixels = np.ascontiguousarray(pixels, np.uint8)
    out = np.empty((n, dim), np.float32)
    lib.taper_parse_idx_images(_u8p(pixels), n, dim, _f32p(out))
    return out


def gather_batch(images: np.ndarray, labels: np.ndarray,
                 idx: np.ndarray):
    lib = load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    idx = np.ascontiguousarray(idx, np.int32)
    bs, dim = len(idx), images.shape[1]
    out_x = np.empty((bs, dim), np.float32)
    out_y = np.empty(bs, np.int32)
    lib.taper_gather_batch(_f32p(images), _i32p(labels), dim, _i32p(idx),
                           bs, _f32p(out_x), _i32p(out_y))
    return out_x, out_y


def shuffle_indices(n: int, seed: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    out = np.empty(n, np.int32)
    lib.taper_shuffle_indices(n, ctypes.c_uint64(seed), _i32p(out))
    return out


def bpe_train(corpus: bytes, n_merges: int) -> Optional[np.ndarray]:
    """Learn up to ``n_merges`` BPE merges; returns [k, 2] int32 pairs
    (exactly equal to the Python trainer's — see native/bpe.cpp) or
    None without the native library."""
    lib = load()
    if lib is None or n_merges <= 0:
        return None
    buf = np.frombuffer(corpus, np.uint8)
    out = np.empty(n_merges * 2, np.int32)
    k = lib.taper_bpe_train(_u8p(buf), len(buf), n_merges, _i32p(out))
    return out[:2 * k].reshape(-1, 2)


def bpe_encode(text: bytes, merges: np.ndarray) -> Optional[np.ndarray]:
    """Encode ``text`` with rank-ordered ``merges`` [k, 2] int32."""
    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(text, np.uint8)
    if len(buf) == 0:
        return np.empty(0, np.int32)
    merges = np.ascontiguousarray(merges, np.int32)
    out = np.empty(len(buf), np.int32)
    n = lib.taper_bpe_encode(_u8p(buf), len(buf), _i32p(merges),
                             len(merges), _i32p(out))
    return out[:n].copy()
