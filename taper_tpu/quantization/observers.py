"""Calibration observers (reference ``src/quantization/observers.rs``).

``MinMaxObserver`` tracks running min/max (``observers.rs:11-121``);
``HistogramObserver`` accumulates a fixed-bin histogram from the first batch
(``observers.rs:125-246``) and can suggest percentile-clipped ranges (an
improvement over the reference, whose histogram is collected but unused);
``ObserverManager`` is a keyed registry (``observers.rs:267-345``).

Unlike the reference — where observers were declared but never wired into
QAT (``observers.rs`` note in SURVEY.md §2.10) — ``qat.py`` here actually
drives ``FakeQuantize`` calibration through these observers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class ObserverStats:
    min_val: float
    max_val: float
    num_batches: int


class MinMaxObserver:
    """Running global min/max over observed batches."""

    def __init__(self):
        self.min_val: Optional[float] = None
        self.max_val: Optional[float] = None
        self.num_batches = 0

    def observe(self, x) -> None:
        x = np.asarray(x)
        mn, mx = float(x.min()), float(x.max())
        self.min_val = mn if self.min_val is None else min(self.min_val, mn)
        self.max_val = mx if self.max_val is None else max(self.max_val, mx)
        self.num_batches += 1

    def get_stats(self) -> ObserverStats:
        if self.min_val is None:
            return ObserverStats(0.0, 0.0, 0)
        return ObserverStats(self.min_val, self.max_val, self.num_batches)

    def reset(self) -> None:
        self.__init__()


class HistogramObserver:
    """Histogram with bins fixed from the first observed batch."""

    def __init__(self, num_bins: int = 2048):
        self.num_bins = num_bins
        self.counts: Optional[np.ndarray] = None
        self.edges: Optional[np.ndarray] = None
        self.num_batches = 0

    def observe(self, x) -> None:
        x = np.asarray(x).reshape(-1)
        if self.edges is None:
            lo, hi = float(x.min()), float(x.max())
            if lo == hi:
                lo, hi = lo - 0.5, hi + 0.5
            self.edges = np.linspace(lo, hi, self.num_bins + 1)
            self.counts = np.zeros(self.num_bins, np.int64)
        c, _ = np.histogram(np.clip(x, self.edges[0], self.edges[-1]),
                            bins=self.edges)
        self.counts += c
        self.num_batches += 1

    def get_range(self, percentile: float = 100.0):
        """(min, max) covering ``percentile``% of observed mass."""
        if self.counts is None:
            return 0.0, 0.0
        if percentile >= 100.0:
            return float(self.edges[0]), float(self.edges[-1])
        total = self.counts.sum()
        tail = total * (100.0 - percentile) / 200.0
        cum = np.cumsum(self.counts)
        lo_idx = int(np.searchsorted(cum, tail))
        hi_idx = int(np.searchsorted(cum, total - tail))
        hi_idx = min(hi_idx, self.num_bins - 1)
        return float(self.edges[lo_idx]), float(self.edges[hi_idx + 1])

    def get_stats(self, percentile: float = 99.9) -> ObserverStats:
        """Percentile-clipped range as ObserverStats — the same contract as
        MinMaxObserver.get_stats, so QAT calibration works with either
        observer kind (reference declares HistogramObserver but never wires
        it, ``observers.rs:125-246``)."""
        lo, hi = self.get_range(percentile)
        return ObserverStats(lo, hi, self.num_batches)

    def reset(self) -> None:
        self.__init__(self.num_bins)


class ObserverManager:
    """Keyed observer registry (``observers.rs:267-345``)."""

    def __init__(self, kind: str = "minmax"):
        assert kind in ("minmax", "histogram")
        self.kind = kind
        self.observers: Dict[str, object] = {}

    def _make(self):
        return MinMaxObserver() if self.kind == "minmax" \
            else HistogramObserver()

    def observe(self, key: str, x) -> None:
        if key not in self.observers:
            self.observers[key] = self._make()
        self.observers[key].observe(x)

    def get(self, key: str):
        return self.observers.get(key)

    def keys(self):
        return list(self.observers.keys())

    def reset(self) -> None:
        for obs in self.observers.values():
            obs.reset()
