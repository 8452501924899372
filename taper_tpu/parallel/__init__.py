"""SPMD parallelism: mesh construction and sharding rules."""

from taper_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, param_sharding, shard_params,
    optimizer_state_sharding, fsdp_sharding,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "param_sharding",
    "shard_params", "optimizer_state_sharding", "fsdp_sharding",
]

from taper_tpu.parallel.spmd import (  # noqa: E402
    make_dp_train_step, replicate_to_mesh, shard_batch_to_mesh,
    sharded_attention, sequence_parallel_attention, ring_attention,
    expert_parallel_moe, ulysses_attention, vocab_parallel_cross_entropy,
)

__all__ += ["make_dp_train_step", "replicate_to_mesh",
            "shard_batch_to_mesh", "sharded_attention",
            "sequence_parallel_attention", "ring_attention",
            "expert_parallel_moe", "ulysses_attention",
            "vocab_parallel_cross_entropy"]

from taper_tpu.parallel.pipeline import (  # noqa: E402
    pipeline_apply, pipeline_apply_circular, stack_layer_params,
    unstack_layer_params, stage_sharding,
)

__all__ += ["pipeline_apply", "pipeline_apply_circular",
            "stack_layer_params", "unstack_layer_params",
            "stage_sharding"]

from taper_tpu.parallel.overlap import (  # noqa: E402
    allgather_matmul, matmul_reducescatter,
)

__all__ += ["allgather_matmul", "matmul_reducescatter"]

from taper_tpu.parallel import multihost  # noqa: E402

__all__ += ["multihost"]

from taper_tpu.parallel.serving import (  # noqa: E402
    tp_sharding, tp_place, make_tp_generate, tp_generate,
)

__all__ += ["tp_sharding", "tp_place", "make_tp_generate", "tp_generate"]
