"""Utility-layer tests: profiling helpers, compilation-cache namespacing,
checkpoint error paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taper_tpu.utils import checkpoint as ckpt
from taper_tpu.utils.cache import _toolchain_tag, enable_compilation_cache
from taper_tpu.utils.profiling import StepTimer, flops_per_step


def test_step_timer_rolls_and_reports_throughput():
    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            pass
    assert len(t.times) == 3          # window enforced
    assert t.mean >= 0.0
    assert t.throughput(256) > 0.0


def test_flops_per_step_counts_matmul():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    cost = flops_per_step(lambda x, y: x @ y, a, b)
    # 2*M*N*K = 524288 flops (cost analysis may fold constants, so allow
    # a wide band but require the right order of magnitude)
    assert cost["flops"] == pytest.approx(2 * 64 * 128 * 32, rel=0.5)


def test_cache_dir_is_namespaced_by_toolchain(tmp_path, monkeypatch):
    # Executables AOT-compiled under one libtpu crash another; the cache
    # path must embed the toolchain identity (round-1 VERDICT root cause).
    monkeypatch.setenv("TAPER_JAX_CACHE", str(tmp_path))
    path = enable_compilation_cache()
    tag = _toolchain_tag()
    assert path.endswith(tag)
    assert jax.__version__ in tag
    import os
    assert os.path.isdir(path)


def test_checkpoint_missing_leaf_and_shape_mismatch(tmp_path):
    tree = {"w": np.ones((3, 4), np.float32)}
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, tree)
    with pytest.raises(KeyError):
        ckpt.load_checkpoint(path, {"w": np.ones((3, 4)),
                                    "extra": np.ones(2)})
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(path, {"w": np.ones((4, 3))})
