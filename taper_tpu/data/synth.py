"""Synthetic MNIST renderer — shared algorithm, two backends.

Renders classifiable 28×28 digits from labels alone, for air-gapped
environments with no dataset access.  The algorithm (xorshift64* stream per
sample; draw order: scale, y0, x0, intensity, 784 noise values; glyph
placement; separable 1-2-1 blur; clip) is implemented identically here
(vectorized NumPy) and in ``native/dataloader.cpp`` (threaded C++), and the
two agree to float rounding (≤1e-6) — ``tests/test_native.py`` asserts it.
"""

from __future__ import annotations

import numpy as np

from taper_tpu.data import native as _native

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MULT = np.uint64(0x2545F4914F6CDD1D)

GLYPHS = {
    0: ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    1: ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    2: ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    3: ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    4: ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    5: ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    6: ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    7: ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    8: ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    9: ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
}


def _xs_next(s: np.ndarray):
    """One xorshift64* step over a vector of states; returns (s, output)."""
    s = s ^ (s >> np.uint64(12))
    s = (s ^ (s << np.uint64(25))) & _M64
    s = s ^ (s >> np.uint64(27))
    return s, (s * _MULT) & _M64


def _uni(out: np.ndarray) -> np.ndarray:
    return (out >> np.uint64(11)).astype(np.float64) * 2.0 ** -53


def synthesize_images_numpy(labels: np.ndarray, seed: int = 0) -> np.ndarray:
    labels = np.asarray(labels, np.int64)
    n = len(labels)
    seeds = (np.uint64(seed) * np.uint64(1000003)
             + np.arange(n, dtype=np.uint64)) & _M64
    s = seeds ^ _GOLD
    s[s == np.uint64(0)] = _GOLD
    s, _ = _xs_next(s)                      # constructor warm-up
    s, raw = _xs_next(s)
    scale = 2 + (raw & np.uint64(1)).astype(np.int64)
    s, raw = _xs_next(s)
    gh, gw = 7 * scale, 5 * scale
    y0 = (_uni(raw) * (28 - gh + 1)).astype(np.int64)
    s, raw = _xs_next(s)
    x0 = (_uni(raw) * (28 - gw + 1)).astype(np.int64)
    s, raw = _xs_next(s)
    intensity = (0.8 + 0.4 * _uni(raw)).astype(np.float32)

    canvas = np.zeros((n, 28, 28), np.float32)
    glyph_arr = np.array(
        [[[c == "1" for c in row] for row in GLYPHS[d]] for d in range(10)],
        np.float32)  # [10, 7, 5]
    for sc in (2, 3):
        m = scale == sc
        if not np.any(m):
            continue
        idx = np.nonzero(m)[0]
        big = np.kron(glyph_arr, np.ones((1, sc, sc), np.float32))  # 10,7s,5s
        rows = y0[idx][:, None] + np.arange(7 * sc)                 # [k, gh]
        cols = x0[idx][:, None] + np.arange(5 * sc)                 # [k, gw]
        canvas[idx[:, None, None], rows[:, :, None], cols[:, None, :]] = \
            big[labels[idx]]

    # separable 1-2-1 blur with zero-padded borders (vertical, horizontal)
    pad = np.pad(canvas, ((0, 0), (1, 1), (0, 0)))
    canvas = 0.25 * pad[:, :-2] + 0.5 * pad[:, 1:-1] + 0.25 * pad[:, 2:]
    pad = np.pad(canvas, ((0, 0), (0, 0), (1, 1)))
    canvas = 0.25 * pad[:, :, :-2] + 0.5 * pad[:, :, 1:-1] \
        + 0.25 * pad[:, :, 2:]

    # 784 noise draws per sample, row-major — same order as the C++ loop
    noise = np.empty((n, 784), np.float64)
    for i in range(784):
        s, raw = _xs_next(s)
        noise[:, i] = (_uni(raw) - 0.5) * 0.16
    out = (canvas.reshape(n, 784) * intensity[:, None]
           + noise.astype(np.float32))
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def synthesize_images(labels: np.ndarray, seed: int = 0,
                      backend: str = "auto") -> np.ndarray:
    """Render digits; 'auto' prefers the threaded C++ backend."""
    if backend in ("auto", "native"):
        out = _native.render_synthetic(np.asarray(labels), seed)
        if out is not None:
            return out
        if backend == "native":
            raise RuntimeError("native dataloader library unavailable")
    return synthesize_images_numpy(labels, seed)
