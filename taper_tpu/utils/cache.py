"""Persistent XLA compilation cache.

First compilation of a scanned-epoch program through the TPU toolchain can
take minutes; caching compiled executables on disk makes every subsequent
process start (benchmarks, examples, notebooks) near-instant for already-
seen program shapes.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str = "") -> str:
    path = path or os.environ.get("TAPER_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
