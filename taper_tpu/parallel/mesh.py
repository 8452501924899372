"""Device mesh + sharding helpers (SPMD over TPU slices).

The reference is single-process with intra-op parallelism only (SURVEY.md
§2.9: rayon loops + threaded BLAS; no DP/TP of any kind).  On TPU the
idiomatic scale-out is GSPMD: build a ``jax.sharding.Mesh`` over the chips,
annotate batch and parameter shardings with ``NamedSharding``, and let XLA
insert the collectives (psum / all-gather / reduce-scatter) over ICI.

Axes used by this library:

* ``data``  — batch (data parallelism); gradients all-reduce over ICI.
* ``model`` — feature/channel dimension of weight matrices (tensor
  parallelism); activations all-gather / reduce-scatter as XLA sees fit.

Everything here also runs on a CPU "virtual TPU" mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``) for testing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh; ``data=0`` means "use all remaining"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == 0:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, tensor_parallel: bool = False):
    """Sharding pytree for parameters.

    * DP only (default): fully replicated — XLA all-reduces grads over
      'data' automatically.
    * ``tensor_parallel=True``: 2-D+ weights shard their leading (output
      feature / out-channel) dimension over 'model' when divisible; 1-D
      biases shard over 'model' when divisible.  XLA inserts the matching
      collectives in forward and backward.
    """
    tp = mesh.shape.get("model", 1)

    def rule(leaf):
        if not tensor_parallel or tp == 1:
            return NamedSharding(mesh, P())
        shape = np.shape(leaf)
        if len(shape) >= 2 and shape[0] % tp == 0:
            spec = ("model",) + (None,) * (len(shape) - 1)
            return NamedSharding(mesh, P(*spec))
        if len(shape) == 1 and shape[0] % tp == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params, shardings):
    """Place a parameter pytree according to a sharding pytree."""
    return jax.tree.map(jax.device_put, params, shardings)


def optimizer_state_sharding(mesh: Mesh, params,
                             tensor_parallel: bool = False,
                             zero1: bool = False):
    """Shardings for optimizer moment slots (m/v).

    Default: mirror the parameter shardings.  ``zero1=True`` additionally
    partitions each slot over the ``data`` axis (ZeRO-1: every DP rank
    stores 1/N of the optimizer state; XLA reconstructs the update with a
    per-step all-gather of the fresh params, which rides ICI).  A dim is
    sharded over 'data' only when divisible and not already taken by
    tensor parallelism.
    """
    dp = mesh.shape.get("data", 1)
    base = param_sharding(mesh, params, tensor_parallel)

    def rule(leaf, psh):
        if not zero1 or dp == 1:
            return psh
        shape = np.shape(leaf)
        spec = list(psh.spec) + [None] * (len(shape) - len(psh.spec))
        for d in range(len(shape)):
            if spec[d] is None and shape[d] % dp == 0 and shape[d] >= dp:
                spec[d] = "data"
                return NamedSharding(mesh, P(*spec))
        return psh

    return jax.tree.map(rule, params, base)


def fsdp_sharding(mesh: Mesh, params, axis: str = "data"):
    """Fully-sharded parameters (the ZeRO-3/FSDP analogue, GSPMD-style):
    every weight shards its largest divisible dim over ``axis``; XLA
    inserts the per-use all-gathers in forward/backward and
    reduce-scatters the gradients — parameter memory per device drops to
    ~1/n with no training-loop changes.  Compose with
    :func:`optimizer_state_sharding` (the moments follow the params).
    """
    n = mesh.shape.get(axis, 1)

    def rule(leaf):
        shape = np.shape(leaf)
        if n > 1 and len(shape) >= 1:
            # largest dim that actually divides n (argmax alone would
            # silently replicate e.g. a [50257, 512] embedding)
            for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
                if shape[d] % n == 0 and shape[d] >= n:
                    spec = [None] * len(shape)
                    spec[d] = axis
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
