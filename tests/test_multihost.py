"""Multi-host runtime helpers (`parallel/multihost.py`).

Only one process exists in CI, so these tests pin down the two things
that CAN be verified here: (a) every helper degrades to the documented
single-process identity/no-op, and (b) the process-aware sharded
checkpoint writer produces a manifest enumerating the GLOBAL shard set
with deterministic offset-keyed filenames — the property that makes the
format correct when each pod host writes only its own shards.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from taper_tpu import parallel
from taper_tpu.parallel import multihost
from taper_tpu.utils.checkpoint import (load_checkpoint_sharded,
                                        save_checkpoint_sharded)


def test_single_process_identities():
    multihost.initialize()          # documented no-op off-pod
    assert multihost.process_count() == 1
    assert multihost.process_index() == 0
    assert multihost.is_primary()
    assert multihost.global_batch_size(32) == 32
    multihost.sync("test")          # no-op barrier

    tree = {"seed": 7, "lr": 1e-3}
    assert multihost.broadcast_from_primary(tree) == tree

    g = multihost.allgather_hosts(np.arange(4.0))
    assert g.shape == (1, 4)
    np.testing.assert_array_equal(g[0], np.arange(4.0))


def test_host_local_array_assembles_global_batch():
    mesh = multihost.global_mesh(data=0, model=1)
    local = np.arange(16 * 6, dtype=np.float32).reshape(16, 6)
    arr = multihost.host_local_array(mesh, P("data", None), local)
    assert arr.shape == (16, 6)     # 1 process: local IS global
    assert arr.sharding == NamedSharding(mesh, P("data", None))
    np.testing.assert_array_equal(np.asarray(arr), local)
    # per-device shard sizes follow the mesh's data axis
    n_data = mesh.shape["data"]
    assert all(s.data.shape[0] == 16 // n_data
               for s in arr.addressable_shards)


def test_host_local_array_feeds_sharded_step():
    mesh = multihost.global_mesh(data=0, model=1)
    x = multihost.host_local_array(mesh, P("data", None),
                                   np.ones((8, 4), np.float32))
    y = jax.jit(lambda a: (a * 2).sum())(x)
    assert float(y) == 64.0


def test_sharded_checkpoint_manifest_is_global(tmp_path):
    """Shard files are keyed by global offsets and the manifest lists
    every shard of the sharding's index map — process-count invariant."""
    mesh = multihost.global_mesh(data=0, model=1)
    n_data = mesh.shape["data"]
    w = jax.device_put(
        jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4),
        NamedSharding(mesh, P("data", None)))
    b = jnp.arange(4, dtype=jnp.float32)          # replicated host leaf
    save_checkpoint_sharded(str(tmp_path), {"w": w, "b": np.asarray(b)})

    import json
    with open(tmp_path / "manifest.json") as f:
        manifest = json.load(f)
    shards = manifest["leaves"]["w"]["shards"]
    assert len(shards) == n_data
    rows = 16 // n_data
    for k, s in enumerate(shards):               # offset-keyed, ordered
        assert s["file"] == f"w.shard{k * rows}_0.npy"
        assert s["index"][0] == [k * rows, (k + 1) * rows]
        assert os.path.exists(tmp_path / s["file"])

    restored, _ = load_checkpoint_sharded(
        str(tmp_path), {"w": jnp.zeros((16, 4)), "b": jnp.zeros(4)},
        shardings={"w": NamedSharding(mesh, P("data", None)), "b": None})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(w))
    np.testing.assert_array_equal(np.asarray(restored["b"]),
                                  np.asarray(b))


def test_sharded_checkpoint_replicated_leaf_writes_once(tmp_path):
    """A fully-replicated device array dedupes to ONE shard file (the
    replica_id==0 copy) while staying loadable onto any layout."""
    mesh = multihost.global_mesh(data=0, model=1)
    v = jax.device_put(jnp.arange(8, dtype=jnp.float32),
                       NamedSharding(mesh, P()))
    save_checkpoint_sharded(str(tmp_path), {"v": v})
    import json
    with open(tmp_path / "manifest.json") as f:
        manifest = json.load(f)
    assert len(manifest["leaves"]["v"]["shards"]) == 1
    restored, _ = load_checkpoint_sharded(str(tmp_path),
                                          {"v": jnp.zeros(8)})
    np.testing.assert_array_equal(np.asarray(restored["v"]), np.arange(8))


def test_multihost_exported_from_parallel():
    assert parallel.multihost is multihost
