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

import queue
import threading
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


class PrefetchLoader:
    """Pipeline a batch iterable onto the device ahead of compute.

    A worker thread pulls batches from the wrapped loader, stages each
    element on device with ``jax.device_put`` (optionally with a
    ``Sharding`` so multi-chip runs land batches pre-sharded), and keeps
    up to ``prefetch`` staged batches in a bounded queue.  The training
    loop then consumes device-resident arrays while the NEXT batch's
    host gather + transfer are already in flight — on TPU the host link
    is the slow side (see the measurement notes in ``bench.py``), so
    this hides it entirely once ``prefetch ≥ 1``.

    The reference has nothing comparable: its loader gathers rows
    synchronously inside the step (``mnist.rs:276-309``).  This is the
    idiomatic JAX double-buffering pattern (cf. flax
    ``prefetch_to_device``), reimplemented so the framework has no flax
    dependency.  Drop-in: ``Trainer.train_epoch(PrefetchLoader(loader))``.
    """

    _DONE = object()

    def __init__(self, loader, prefetch: int = 2, sharding=None):
        if prefetch < 1:
            raise ValueError(f"prefetch must be >= 1, got {prefetch}")
        self.loader = loader
        self.prefetch = prefetch
        self.sharding = sharding

    def __len__(self) -> int:
        return len(self.loader)

    def _stage(self, batch):
        import jax
        return tuple(
            jax.device_put(np.asarray(b), self.sharding)
            if isinstance(b, np.ndarray) or hasattr(b, "shape") else b
            for b in batch)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for batch in self.loader:
                    if stop.is_set():      # consumer exited early
                        return
                    q.put(self._stage(batch))
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer thread
                q.put(e)
                return
            q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # On early exit: signal the worker to stop AFTER at most one
            # more batch (no stage-everything-to-device drain), then
            # unblock it if it is parked on the full queue.
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.01)
