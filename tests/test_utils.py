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


# ---------------------------------------------------------------------------
# CheckpointManager: rotation, best-k retention, async snapshot semantics,
# sharded restore.  (The reference has no checkpoint management at all —
# train.rs:264-292 is a single write-only dump.)
# ---------------------------------------------------------------------------

def _ckpt_files(d):
    import os
    return sorted(f for f in os.listdir(d) if f.endswith(".npz"))


def test_manager_rotation_keeps_last_k(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path), max_to_keep=2)
    for step in range(5):
        mgr.save(step, {"w": np.full((2,), step, np.float32)})
    assert mgr.all_steps() == [3, 4]
    assert len(_ckpt_files(tmp_path)) == 2
    tree, _ = mgr.restore({"w": np.zeros((2,), np.float32)})
    np.testing.assert_array_equal(tree["w"], np.full((2,), 4))


def test_manager_keep_best_survives_rotation(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path), max_to_keep=1,
                                 keep_best=1, mode="min")
    losses = [3.0, 0.5, 2.0, 1.0]          # best is step 1
    for step, m in enumerate(losses):
        mgr.save(step, {"w": np.full((2,), step, np.float32)}, metric=m)
    assert mgr.best_step() == 1
    assert set(mgr.all_steps()) == {1, 3}   # best + newest
    tree, _ = mgr.restore({"w": np.zeros((2,), np.float32)}, step=1)
    np.testing.assert_array_equal(tree["w"], np.full((2,), 1))


def test_manager_async_save_snapshots_before_mutation(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path), async_save=True)
    w = np.arange(4, dtype=np.float32)
    mgr.save(0, {"w": w})
    w += 100.0                              # mutate AFTER save returns
    mgr.wait()
    tree, _ = mgr.restore({"w": np.zeros((4,), np.float32)})
    np.testing.assert_array_equal(tree["w"], np.arange(4, dtype=np.float32))


def test_manager_restore_latest_and_metadata(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path))
    mgr.save(7, {"w": np.ones((2,), np.float32)},
             metadata={"epoch": 7.0})
    mgr2 = ckpt.CheckpointManager(str(tmp_path))   # fresh process view
    assert mgr2.latest_step() == 7
    tree, meta = mgr2.restore({"w": np.zeros((2,), np.float32)})
    assert meta["epoch"] == 7.0
    with pytest.raises(KeyError):
        mgr2.restore({"w": np.zeros((2,), np.float32)}, step=99)


def test_load_checkpoint_resharding_onto_mesh(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    tree = {"w": np.arange(64, dtype=np.float32).reshape(8, 8),
            "b": np.arange(8, dtype=np.float32)}
    path = str(tmp_path / "sharded.npz")
    ckpt.save_checkpoint(path, tree)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    shardings = {"w": NamedSharding(mesh, P("data", "model")),
                 "b": NamedSharding(mesh, P("model"))}
    restored, _ = ckpt.load_checkpoint(path, tree, shardings=shardings)
    assert restored["w"].sharding == shardings["w"]
    assert restored["b"].sharding == shardings["b"]
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
    np.testing.assert_array_equal(np.asarray(restored["b"]), tree["b"])

    # resharding on load: a DIFFERENT layout than saved-from is fine
    resharded, _ = ckpt.load_checkpoint(
        path, tree, shardings={"w": NamedSharding(mesh, P("model", None)),
                               "b": NamedSharding(mesh, P())})
    np.testing.assert_array_equal(np.asarray(resharded["w"]), tree["w"])


# ---------------------------------------------------------------------------
# Sharded checkpoint format: one file per device shard, manifest-committed,
# restore onto same/different/no mesh.
# ---------------------------------------------------------------------------

def test_sharded_checkpoint_roundtrip_and_reshard(tmp_path):
    import os
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    tree = {"w": np.arange(64, dtype=np.float32).reshape(8, 8),
            "b": np.arange(8, dtype=np.float32),
            "step": np.int32(7)}
    sharded = {
        "w": jax.device_put(tree["w"], NamedSharding(mesh, P("data",
                                                             "model"))),
        "b": jax.device_put(tree["b"], NamedSharding(mesh, P("model"))),
        "step": jax.device_put(tree["step"], NamedSharding(mesh, P())),
    }
    d = str(tmp_path / "sharded")
    ckpt.save_checkpoint_sharded(d, sharded, metadata={"epoch": 3})

    files = sorted(os.listdir(d))
    assert "manifest.json" in files
    # w is split 4x2 = 8 unique shards; b 2 (model axis, dedup'd over
    # data replicas); step replicated -> 1
    assert sum(f.startswith("w.shard") for f in files) == 8
    assert sum(f.startswith("b.shard") for f in files) == 2
    assert sum(f.startswith("step") for f in files) == 1

    # restore without a mesh (host arrays)
    got, meta = ckpt.load_checkpoint_sharded(d, tree)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(got["w"], tree["w"])
    np.testing.assert_array_equal(got["b"], tree["b"])
    assert got["step"] == 7

    # restore onto a DIFFERENT layout than saved
    resh = {"w": NamedSharding(mesh, P("model", "data")),
            "b": NamedSharding(mesh, P()),
            "step": NamedSharding(mesh, P())}
    got2, _ = ckpt.load_checkpoint_sharded(d, tree, shardings=resh)
    assert got2["w"].sharding == resh["w"]
    np.testing.assert_array_equal(np.asarray(got2["w"]), tree["w"])

    # template shape mismatch is rejected
    with pytest.raises(ValueError):
        ckpt.load_checkpoint_sharded(d, {**tree,
                                         "w": np.zeros((4, 4),
                                                       np.float32)})


def test_sharded_checkpoint_bf16_and_fp8_leaves(tmp_path):
    """Regression: ml_dtypes leaves (bfloat16/float8) round-trip through
    the sharded per-device format — np.load returns them as raw void
    records, which the loader must reinterpret (previously crashed with
    'No cast function available')."""
    import jax.numpy as jnp
    from taper_tpu.utils.checkpoint import (save_checkpoint_sharded,
                                            load_checkpoint_sharded)
    tree = {
        "bf16": jnp.arange(12, dtype=jnp.bfloat16).reshape(3, 4) * 0.5,
        "f8": jnp.asarray([[1.0, -2.0], [0.5, 4.0]],
                          jnp.float8_e4m3fn),
        "f32": jnp.ones((2, 2), jnp.float32),
    }
    d = str(tmp_path / "ck")
    save_checkpoint_sharded(d, tree)
    back, _ = load_checkpoint_sharded(d, tree)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(tree[k]))
        assert back[k].dtype == tree[k].dtype, k


def test_checkpoint_manager_surfaces_async_save_failure(tmp_path):
    """Regression: a failed background save must raise from wait()
    instead of silently leaving no checkpoint."""
    import pytest
    from taper_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "mgr"), async_save=True)
    mgr.save(1, {"w": np.ones(3)})
    mgr.wait()
    # point the next save under a path whose parent is a FILE, so the
    # worker's makedirs/open raises
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    mgr.directory = str(blocker / "sub")
    mgr.save(2, {"w": np.ones(3)})
    with pytest.raises(RuntimeError, match="checkpoint save failed"):
        mgr.wait()
