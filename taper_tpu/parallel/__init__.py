"""SPMD parallelism: mesh construction and sharding rules."""

from taper_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, param_sharding, shard_params,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "param_sharding",
    "shard_params",
]
