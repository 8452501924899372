"""Subprocess worker for the real multi-process multihost test.

Launched by ``tests/test_multiprocess.py`` as N independent Python
processes that rendezvous through ``jax.distributed`` on CPU (each
process contributes ``--xla_force_host_platform_device_count`` virtual
devices to one global device list).  This exercises the pod-runtime
paths of ``taper_tpu.parallel.multihost`` and the per-host writes of
``save_checkpoint_sharded`` across an actual process boundary — the one
case the in-suite single-process tests cannot reach
(``tests/test_multihost.py`` docstring).

Every check is computed against a pure-numpy expectation that each
process derives independently, so no process trusts another's output.
Exit code 0 == all assertions passed on this process.
"""
import json
import os
import sys

# Platform must be pinned before jax configures a backend (the host's
# sitecustomize pre-registers a TPU plugin).
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    coord, nproc, pid, workdir = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    from taper_tpu.parallel import multihost
    from taper_tpu.utils.checkpoint import (load_checkpoint_sharded,
                                            save_checkpoint_sharded)

    multihost.initialize(coordinator_address=coord,
                         num_processes=nproc, process_id=pid)
    assert multihost.process_count() == nproc, jax.process_count()
    assert multihost.process_index() == pid
    assert multihost.is_primary() == (pid == 0)
    local_dev = len(jax.local_devices())
    n_dev = len(jax.devices())
    assert n_dev == nproc * local_dev, (n_dev, local_dev)

    # ---- host_local_array assembles the global batch --------------
    mesh = multihost.global_mesh(data=0, model=1)
    rows_per_host = 8
    gb = rows_per_host * nproc
    cols = 4
    # global batch is a deterministic formula; host p holds rows
    # [p*8, (p+1)*8) — every process can reconstruct the whole thing
    full = np.arange(gb * cols, dtype=np.float32).reshape(gb, cols)
    local = full[pid * rows_per_host:(pid + 1) * rows_per_host]
    x = multihost.host_local_array(mesh, P("data", None), local)
    assert x.shape == (gb, cols), x.shape
    assert multihost.global_batch_size(rows_per_host) == gb
    got = float(jax.jit(jnp.sum)(x))
    assert got == float(full.sum()), (got, full.sum())

    # ---- one DP train step == the single-process answer -----------
    w0 = np.full((cols,), 0.5, np.float32)
    y_full = full @ np.ones(cols, np.float32)
    w = jax.device_put(jnp.asarray(w0), NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x):
        def loss(w):
            pred = x @ w
            return jnp.mean((pred - jnp.asarray(y_full)) ** 2)
        return w - 0.001 * jax.grad(loss)(w)

    w1 = np.asarray(jax.jit(step)(w, x))
    # numpy single-process expectation
    grad = 2.0 / gb * full.T @ (full @ w0 - y_full)
    exp = w0 - 0.001 * grad
    np.testing.assert_allclose(w1, exp, rtol=1e-5)

    # ---- control-plane collectives ---------------------------------
    seed = multihost.broadcast_from_primary(
        {"seed": 1234 if pid == 0 else -1})
    assert int(seed["seed"]) == 1234, seed
    g = multihost.allgather_hosts(np.float32(pid))
    np.testing.assert_array_equal(np.sort(g.ravel()),
                                  np.arange(nproc, dtype=np.float32))
    multihost.sync("mp-test")

    # ---- per-host sharded checkpoint writes ------------------------
    ckpt = os.path.join(workdir, "ckpt")
    wshard = jax.device_put(
        jnp.asarray(full), NamedSharding(mesh, P("data", None)))
    brep = jax.device_put(jnp.arange(cols, dtype=jnp.float32),
                          NamedSharding(mesh, P()))
    save_checkpoint_sharded(ckpt, {"w": wshard, "b": brep})
    # manifest must exist for every process once save returns (the
    # writer barriers before/after the primary's manifest commit)
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))
    with open(os.path.join(ckpt, "manifest.json")) as f:
        manifest = json.load(f)
    n_data = mesh.shape["data"]
    assert len(manifest["leaves"]["w"]["shards"]) == n_data
    restored, _ = load_checkpoint_sharded(
        ckpt, {"w": jnp.zeros((gb, cols)), "b": jnp.zeros(cols)},
        shardings={"w": NamedSharding(mesh, P("data", None)),
                   "b": NamedSharding(mesh, P())})
    # the global array spans non-addressable devices — verify this
    # process's addressable shards slice-for-slice against the formula
    for s in restored["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), full[s.index])
    np.testing.assert_array_equal(
        np.asarray(restored["b"].addressable_shards[0].data),
        np.arange(cols, dtype=np.float32))
    multihost.sync("mp-done")

    # marker consumed by the parent test
    with open(os.path.join(workdir, f"ok.{pid}"), "w") as f:
        f.write("ok")
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
