"""Backend selection for the op library.

The reference selects its GEMM backend with cargo feature flags
(``blas`` / ``blas-accelerate`` vs. pure-Rust ``matrixmultiply``; see reference
``Cargo.toml:22-29``, ``src/gemm.rs:3,61``).  The TPU-native equivalent is a
runtime switch between:

* ``"xla"``    — ops lower to plain ``jax.numpy`` / ``lax`` and rely on XLA
  fusion.  Always available, used as the correctness oracle in tests.
* ``"pallas"`` — hand-written Pallas kernels targeting the MXU/VPU (tiled
  matmul, fused conv+bias+ReLU epilogues, fused optimizer updates).  On
  non-TPU hosts the kernels run through the Pallas interpreter so the same
  code path stays testable on the CPU mesh.
"""

from __future__ import annotations

import contextlib
import os

import jax

_BACKENDS = ("xla", "pallas")
_state = {"backend": os.environ.get("TAPER_BACKEND", "xla")}


def set_backend(name: str) -> None:
    """Select the global op backend ('xla' or 'pallas')."""
    if name not in _BACKENDS:
        raise ValueError(f"unknown backend {name!r}; expected one of {_BACKENDS}")
    _state["backend"] = name


def get_backend() -> str:
    return _state["backend"]


@contextlib.contextmanager
def use_backend(name: str):
    """Temporarily switch backend (used by parity tests)."""
    prev = get_backend()
    set_backend(name)
    try:
        yield
    finally:
        set_backend(prev)


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - defensive
        return False


def pallas_interpret_mode() -> bool:
    """Pallas kernels run interpreted off-TPU so tests work on the CPU mesh."""
    return not on_tpu()
