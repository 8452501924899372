"""Multi-host (pod-scale) runtime helpers.

A TPU pod slice runs ONE Python process per host; after
``jax.distributed`` initialization JAX presents every chip in the slice
as one global device list, and GSPMD programs written against a global
``Mesh`` run unchanged — each process feeds the host-local shard of the
batch and XLA lowers collectives onto ICI (and DCN across slices).
These helpers wrap the process-aware steps every pod program needs:

* :func:`initialize` — bring up the cross-process runtime (auto-config
  on Cloud TPU; explicit coordinator otherwise); idempotent.
* :func:`host_local_array` — assemble a GLOBAL jax.Array from each
  process's local batch slab (the data-feeding idiom: every host loads
  ``global_batch / process_count`` examples and no host ever
  materializes the full batch).
* :func:`broadcast_from_primary` / :func:`allgather_hosts` /
  :func:`sync` — control-plane collectives for seeds, eval metrics and
  checkpoint barriers.
* :func:`is_primary` — gate logging / manifest writes to process 0.

Everything degrades to a no-op / identity at ``process_count() == 1``,
so the same training script runs on one chip, one 8-chip host, or a
v5e-256 pod without modification.  The reference is a single-process
CPU framework (no distributed runtime anywhere in
``/root/reference/src``); this module is part of the beyond-reference
TPU scaling story (SURVEY.md §5.8) and is the missing third leg next to
the in-process mesh tools (``parallel/mesh.py``) and the sharded
checkpoint format (``utils/checkpoint.py``).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the cross-process JAX runtime (idempotent).

    On Cloud TPU pods ``jax.distributed.initialize()`` auto-discovers the
    coordinator from the metadata server, so all three arguments stay
    ``None``.  Off-TPU (e.g. CPU/GPU clusters) pass them explicitly, or
    export ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``.  When neither arguments, env vars, nor a TPU
    platform are present this is a documented no-op — the single-process
    path needs no runtime and must not pay a failed coordinator dial.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # detect a MULTI-host TPU pod WITHOUT forcing backend init
    # (jax.distributed must run before the backend comes up): Cloud TPU
    # sets TPU_WORKER_HOSTNAMES to the comma-separated host list; a
    # single entry (or absence) means one process and nothing to dial
    multi_host_tpu = ("," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
                      or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not multi_host_tpu:
        return                      # single-process: nothing to bring up
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on exactly one process — gate log lines, metric files and
    checkpoint manifests on this (every process still participates in
    the collective parts of a save)."""
    return jax.process_index() == 0


def global_mesh(data: int = 0, model: int = 1) -> Mesh:
    """``(data, model)`` mesh over ALL devices in the slice (global, not
    host-local).  ``data=0`` means "everything not consumed by model",
    matching :func:`taper_tpu.parallel.make_mesh` — which already builds
    over ``jax.devices()`` and therefore IS pod-global; this alias
    exists so pod scripts read explicitly.
    """
    from taper_tpu.parallel.mesh import make_mesh
    return make_mesh(data=data, model=model)


def host_local_array(mesh: Mesh, pspec: P, local_data) -> jax.Array:
    """Assemble a global array from per-process local slabs.

    Each process passes ONLY its host-local chunk (e.g. the
    ``global_batch / process_count`` examples its own input pipeline
    loaded); the result is one global ``jax.Array`` sharded as
    ``NamedSharding(mesh, pspec)`` with no cross-host data motion beyond
    what the sharding itself requires.  At ``process_count() == 1`` this
    is exactly ``jax.device_put(local_data, sharding)``.
    """
    sharding = NamedSharding(mesh, pspec)
    local_data = np.asarray(local_data)
    return jax.make_array_from_process_local_data(sharding, local_data)


def global_batch_size(local_batch: int) -> int:
    return local_batch * jax.process_count()


def broadcast_from_primary(tree: Any) -> Any:
    """Broadcast a host-side pytree from process 0 to every process —
    the idiom for a shared RNG seed or a primary-elected config.
    Identity at one process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def allgather_hosts(x) -> np.ndarray:
    """Gather a per-process value to all processes, stacked on a new
    leading axis of size ``process_count()`` — e.g. per-host throughput
    or eval counts.  At one process: ``x[None]``."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)


def sync(name: str = "taper_sync") -> None:
    """Barrier across processes (no-op at one process).  Place one
    between writing checkpoint shards and writing the manifest so no
    process races ahead of the slowest writer."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
