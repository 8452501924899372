"""CIFAR-10 dataset (the BASELINE.json stretch workload).

Parses the canonical binary format (10000 records of 1 label byte +
3072 RGB bytes per batch file), with mirrored download and — in air-gapped
environments — a deterministic synthetic fallback: each class is a colored
sinusoidal-grating texture with per-sample phase/orientation/position
jitter and noise, which a small CNN can classify but not trivially
(linearly) separate.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from typing import Tuple

import numpy as np

_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-binary.tar.gz"
_TRAIN_FILES = [f"data_batch_{i}.bin" for i in range(1, 6)]
_TEST_FILES = ["test_batch.bin"]
_REC = 1 + 3072


def parse_cifar_batch(data: bytes) -> Tuple[np.ndarray, np.ndarray]:
    n = len(data) // _REC
    arr = np.frombuffer(data, np.uint8, count=n * _REC).reshape(n, _REC)
    labels = arr[:, 0].astype(np.int32)
    # stored as [C=3, 32, 32] per record
    images = arr[:, 1:].reshape(n, 3, 32, 32).astype(np.float32) / 255.0
    return images, labels


def synthesize_cifar(labels: np.ndarray, seed: int = 0) -> np.ndarray:
    """[N, 3, 32, 32] synthetic class-texture images (v2 — non-saturating).

    Each class is a colored sinusoidal grating; v2 spaces class frequencies
    closer, blends in a distractor grating from a random OTHER class,
    randomizes contrast, drops a gray occluder patch on each image and
    roughly doubles the noise, so accuracy gates discriminate instead of
    pinning at 100% after one epoch (same motivation as the MNIST v2
    renderer)."""
    rng = np.random.default_rng(seed)
    n = len(labels)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    # class signatures from a FIXED generator so train/test splits agree.
    # Color is PER-SAMPLE (not class-tied): a class-colored palette was a
    # one-epoch shortcut; identity lives only in grating angle+frequency.
    freqs = 1.0 + np.arange(10) * 0.35         # cycles per image (closer)
    angles = np.arange(10) * (np.pi / 10)
    colors = rng.uniform(0.3, 1.0, (n, 3)).astype(np.float32)
    out = np.empty((n, 3, 32, 32), np.float32)
    phase = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    phase2 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    jitter = rng.normal(0, 0.12, (n, 2)).astype(np.float32)
    # distractor is always a DIFFERENT class (own+1..own+9 mod 10)
    distract = (labels + 1 + rng.integers(0, 9, n)) % 10
    contrast = rng.uniform(0.6, 1.0, n).astype(np.float32)
    occ_y = rng.integers(0, 24, n)
    occ_x = rng.integers(0, 24, n)
    occ_s = rng.integers(4, 11, n)
    occ_v = rng.uniform(0.2, 0.8, n).astype(np.float32)
    noise = rng.normal(0, 0.14, (n, 3, 32, 32)).astype(np.float32)

    def grating(cls_arr, idx, ph, amp):
        a = angles[cls_arr] + jitter[idx, 0]
        f = freqs[cls_arr] * (1.0 + jitter[idx, 1])
        proj = (np.cos(a)[:, None, None] * xx
                + np.sin(a)[:, None, None] * yy) / 32.0
        return amp * (0.5 + 0.5 * np.sin(
            2 * np.pi * f[:, None, None] * proj + ph[:, None, None]))

    for c in range(10):
        idx = np.nonzero(labels == c)[0]
        if len(idx) == 0:
            continue
        tex = grating(np.full(len(idx), c), idx, phase[idx], 1.0)
        tex = tex + grating(distract[idx], idx, phase2[idx], 0.35)
        tex = (tex / 1.35) * contrast[idx][:, None, None]
        out[idx] = tex[:, None, :, :] * colors[idx][:, :, None, None]
    for i in range(n):  # gray occluder patch
        s = occ_s[i]
        out[i, :, occ_y[i]:occ_y[i] + s, occ_x[i]:occ_x[i] + s] = occ_v[i]
    out += noise
    return np.clip(out, 0.0, 1.0)


class CIFAR10Dataset:
    """``images: [N, 3, 32, 32]`` f32 in [0,1]; ``labels: [N]`` int32."""

    def __init__(self, train: bool = True, data_dir: str = "data/cifar10",
                 allow_download: bool = True, allow_synthetic: bool = True):
        os.makedirs(data_dir, exist_ok=True)
        files = _TRAIN_FILES if train else _TEST_FILES
        paths = [os.path.join(data_dir, f) for f in files]
        self.source = "binary"

        if not all(os.path.exists(p) for p in paths) and allow_download:
            self._download(data_dir)

        if all(os.path.exists(p) for p in paths):
            images, labels = [], []
            for p in paths:
                with open(p, "rb") as f:
                    im, lb = parse_cifar_batch(f.read())
                images.append(im)
                labels.append(lb)
            self.images = np.concatenate(images)
            self.labels = np.concatenate(labels)
        else:
            if not allow_synthetic:
                raise FileNotFoundError(f"CIFAR-10 unavailable in {data_dir}")
            n = 50000 if train else 10000
            seed = 0 if train else 1
            self.labels = np.random.default_rng(seed).integers(
                0, 10, n).astype(np.int32)
            cache = os.path.join(
                data_dir, f"{'train' if train else 'test'}_syn_v2.npy")
            if os.path.exists(cache):
                self.images = np.load(cache)
            else:
                self.images = synthesize_cifar(self.labels, seed)
                try:
                    np.save(cache, self.images)
                except OSError:
                    pass
            self.source = "synthetic"

    @staticmethod
    def _download(data_dir: str) -> None:
        try:
            tar_path = os.path.join(data_dir, "cifar10.tar.gz")
            req = urllib.request.Request(
                _URL, headers={"User-Agent": "Mozilla/5.0 (taper-tpu)"})
            with urllib.request.urlopen(req, timeout=240) as r, \
                    open(tar_path, "wb") as f:
                f.write(r.read())
            with tarfile.open(tar_path) as tar:
                for m in tar.getmembers():
                    if m.name.endswith(".bin"):
                        m.name = os.path.basename(m.name)
                        tar.extract(m, data_dir)
            os.remove(tar_path)
        except Exception:
            pass

    def __len__(self) -> int:
        return len(self.labels)

    def get_batch(self, indices):
        idx = np.asarray(indices)
        return self.images[idx], self.labels[idx]
