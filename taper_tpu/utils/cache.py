"""Persistent XLA compilation cache.

First compilation of a scanned-epoch program through the TPU toolchain can
take minutes; caching compiled executables on disk makes every subsequent
process start (benchmarks, examples, notebooks) near-instant for already-
seen program shapes.

The cache directory is namespaced by the live toolchain (jax version +
backend platform/version): executables AOT-compiled under one libtpu crash
when deserialized by another, so a toolchain upgrade must land in a fresh
subdirectory rather than replaying stale entries.
"""

from __future__ import annotations

import os
import re

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _toolchain_tag() -> str:
    """Identify the compiler/runtime pair; initializes the backend (callers
    invoke this right before heavy jax use, so that cost is already due)."""
    tag = jax.__version__
    try:
        import jax.extend as jex

        backend = jex.backend.get_backend()
        tag += f"-{backend.platform}-{getattr(backend, 'platform_version', '')}"
    except Exception:
        pass
    return re.sub(r"[^A-Za-z0-9._-]+", "_", tag)[:96]


def enable_compilation_cache(path: str = "") -> str:
    base = path or os.environ.get("TAPER_JAX_CACHE", _DEFAULT)
    path = os.path.join(base, _toolchain_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
