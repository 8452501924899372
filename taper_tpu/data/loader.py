"""Batching data loader (reference ``src/data/mnist.rs:326-385``).

Shuffles on construction and on every ``reset()``; iterates ``(images,
labels)`` NumPy batches.  One deliberate deviation from the reference: the
reference yields a ragged final batch (``mnist.rs:377-378``), which under jit
would trigger a recompile per epoch — here the default is ``drop_last=True``
for training and full-batch evaluation for metrics (static shapes are a TPU
requirement, SURVEY.md §7 "dynamic shapes").  ``drop_last=False`` pads the
tail batch up to ``batch_size`` and exposes the true count via the third
element of the yielded tuple when ``with_count=True``.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 with_count: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.with_count = with_count
        self._rng = np.random.default_rng(seed)
        self._order: Optional[np.ndarray] = None
        self.reset()

    @property
    def num_batches(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def reset(self) -> None:
        n = len(self.dataset)
        self._order = (self._rng.permutation(n) if self.shuffle
                       else np.arange(n))

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        n = len(self.dataset)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = self._order[start:start + bs]
            count = len(idx)
            if count < bs:
                if self.drop_last:
                    break
                pad = np.zeros(bs - count, dtype=idx.dtype)
                idx = np.concatenate([idx, pad])
            x, y = self.dataset.get_batch(idx)
            if self.with_count:
                yield x, y, count
            else:
                yield x, y
        self.reset()  # reshuffle for the next epoch (mnist.rs:380)
