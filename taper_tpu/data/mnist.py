"""MNIST dataset: IDX parsing, mirrored download, synthetic fallback.

Rebuild of the reference's data layer (``src/data/mnist.rs``):

* mirrored download list + size sanity checks — ``mnist.rs:9-19, 60-106``
* gzip decompress with magic-byte recovery    — ``mnist.rs:152-181``
* IDX image/label parsers with magic checks   — ``mnist.rs:184-273``
* ``get_batch`` gather + ``normalize``        — ``mnist.rs:276-322``

Additions beyond the reference:

* A **deterministic synthetic fallback**: when images are unavailable and the
  network is unreachable, digit images are rendered procedurally from the
  real label files (a 5×7 glyph, scaled, jittered, blurred, noised — seeded
  by sample index, so every run sees the same data).  This keeps the full
  train/eval pipeline runnable and learnable in air-gapped environments; the
  loader records ``source='synthetic'`` so benchmarks can report it.
* Batching is host-side NumPy; arrays move to device once per step via the
  jitted train step's argument transfer (donated on TPU).
"""

from __future__ import annotations

import gzip
import os
import struct
import urllib.request
from typing import Tuple

import numpy as np

_MIRRORS = [
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
    "http://yann.lecun.com/exdb/mnist/",
]

_FILES = {
    "train_images": ("train-images-idx3-ubyte.gz", 9912422, 47040016),
    "train_labels": ("train-labels-idx1-ubyte.gz", 28881, 60008),
    "test_images": ("t10k-images-idx3-ubyte.gz", 1648877, 7840016),
    "test_labels": ("t10k-labels-idx1-ubyte.gz", 4542, 10008),
}

from taper_tpu.data import native as _native
from taper_tpu.data.synth import synthesize_images


def _decompress_gzip(raw: bytes) -> bytes:
    """Gunzip with the reference's magic-byte recovery scan
    (``mnist.rs:166-179``): if the buffer doesn't start with the gzip
    magic, search for it (some mirrors prepend HTML errors)."""
    if raw[:2] != b"\x1f\x8b":
        idx = raw.find(b"\x1f\x8b")
        if idx < 0:
            raise ValueError("not a gzip stream")
        raw = raw[idx:]
    return gzip.decompress(raw)


def _download(name: str, dest: str, timeout: float = 120.0) -> bool:
    fname, gz_size, raw_size = _FILES[name]
    for mirror in _MIRRORS:
        url = mirror + fname
        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": "Mozilla/5.0 (taper-tpu)"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                raw = r.read()
            data = _decompress_gzip(raw)
            if len(data) != raw_size:
                continue
            with open(dest, "wb") as f:
                f.write(data)
            return True
        except Exception:
            continue
    return False


def parse_idx_images(data: bytes) -> np.ndarray:
    magic, n, rows, cols = struct.unpack(">IIII", data[:16])
    if magic != 0x803:
        raise ValueError(f"bad IDX image magic {magic:#x}")
    expect = 16 + n * rows * cols
    if len(data) < expect:
        raise ValueError(f"truncated IDX image file: {len(data)} < {expect}")
    imgs = np.frombuffer(data, np.uint8, count=n * rows * cols, offset=16)
    out = _native.parse_idx_pixels(imgs, n, rows * cols)  # threaded C++
    if out is not None:
        return out
    return imgs.reshape(n, rows * cols).astype(np.float32) / 255.0


def parse_idx_labels(data: bytes) -> np.ndarray:
    magic, n = struct.unpack(">II", data[:8])
    if magic != 0x801:
        raise ValueError(f"bad IDX label magic {magic:#x}")
    if len(data) < 8 + n:
        raise ValueError("truncated IDX label file")
    labels = np.frombuffer(data, np.uint8, count=n, offset=8).astype(np.int32)
    if labels.size and labels.max() > 9:
        # Corrupt/malicious mirror payload; a >9 label would index past the
        # 10-glyph table in downstream consumers.
        raise ValueError(f"IDX label out of range: max {labels.max()}")
    return labels


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

class MNISTDataset:
    """``images: [N, 784]`` float32 in [0, 1]; ``labels: [N]`` int32.

    Resolution order per split: existing raw IDX files in ``data_dir`` →
    mirrored download → synthetic rendering from the label file (which the
    repo ships) → fully synthetic labels.
    """

    def __init__(self, train: bool = True, data_dir: str = "data/mnist",
                 allow_download: bool = True, allow_synthetic: bool = True):
        self.train = train
        self.data_dir = data_dir
        os.makedirs(data_dir, exist_ok=True)
        split = "train" if train else "test"
        self.source = "idx"

        labels = self._load_or_fetch(f"{split}_labels", parse_idx_labels,
                                     allow_download)
        images = self._load_or_fetch(f"{split}_images", parse_idx_images,
                                     allow_download)

        if labels is None:
            if not allow_synthetic:
                raise FileNotFoundError(
                    f"MNIST {split} labels unavailable in {data_dir}")
            n = 60000 if train else 10000
            labels = np.random.default_rng(0 if train else 1).integers(
                0, 10, n).astype(np.int32)
            self.source = "synthetic"
        if images is None:
            if not allow_synthetic:
                raise FileNotFoundError(
                    f"MNIST {split} images unavailable in {data_dir}")
            # Rendering 60k digits costs ~2 min of NumPy; cache to disk.
            # (v2: harder renderer — stale v1 caches must not be reused.)
            cache = os.path.join(data_dir, f"{split}_synthetic_v2.npy")
            if os.path.exists(cache):
                images = np.load(cache)
                if len(images) != len(labels):
                    images = None
            else:
                images = None
            if images is None:
                images = synthesize_images(labels, seed=0 if train else 1)
                try:
                    np.save(cache, images)
                except OSError:
                    pass
            self.source = "synthetic"

        assert len(images) == len(labels)
        self.images = images
        self.labels = labels

    def _load_or_fetch(self, name: str, parser, allow_download: bool):
        path = os.path.join(self.data_dir, name)
        _, _, raw_size = _FILES[name]
        if os.path.exists(path):
            # Reference-style size sanity check with re-download
            # (mnist.rs:65-74).
            if os.path.getsize(path) == raw_size or not allow_download:
                try:
                    with open(path, "rb") as f:
                        return parser(f.read())
                except (ValueError, struct.error):
                    # struct.error: file shorter than the IDX header (the
                    # size check is skipped when allow_download=False).
                    pass
        if allow_download and _download(name, path):
            with open(path, "rb") as f:
                return parser(f.read())
        return None

    def __len__(self) -> int:
        return len(self.labels)

    def get_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.asarray(indices, np.int32)
        out = _native.gather_batch(self.images, self.labels, idx)
        if out is not None:
            return out  # threaded C++ gather (reference mnist.rs:290-302)
        return self.images[idx], self.labels[idx]

    def normalize(self, mean: float, std: float) -> "MNISTDataset":
        self.images = (self.images - mean) / std
        return self
