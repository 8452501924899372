"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference times epochs with ``std::time::Instant`` and prints rolling
batch averages.  The TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution.
* :class:`StepTimer` — wall-clock step/epoch timing with
  ``block_until_ready`` so device async execution doesn't hide work.
* :func:`flops_per_step` — analytic FLOP counting via jax's cost analysis,
  the principled version of the reference's hand-computed GFLOPS prints
  (``tests/smoke.rs:113-158``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/taper_trace"):
    """Capture a device profile: ``with trace("dir"): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timings (the reference's batch_times pattern,
    ``examples/train_mnist_cnn.rs:149-187``)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def block_and_stop(self, result):
        """Call with the step output to include device time."""
        jax.block_until_ready(result)
        self.__exit__()
        return result

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else 0.0


def flops_per_step(fn, *args) -> Dict[str, float]:
    """Static cost analysis of a jitted function (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per device
        cost = cost[0] if cost else {}
    return {"flops": float(cost.get("flops", -1.0)),
            "bytes accessed": float(cost.get("bytes accessed", -1.0))}
