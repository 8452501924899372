"""Data pipeline: MNIST dataset + batching loader."""

from taper_tpu.data.mnist import (
    MNISTDataset, parse_idx_images, parse_idx_labels, synthesize_images,
)
from taper_tpu.data.loader import DataLoader, PrefetchLoader
from taper_tpu.data.tokenizer import BPETokenizer

__all__ = [
    "MNISTDataset", "DataLoader", "PrefetchLoader", "BPETokenizer",
    "parse_idx_images", "parse_idx_labels", "synthesize_images",
]
