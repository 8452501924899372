"""taper_tpu — a TPU-native neural-network training library.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference Rust
library ``vaibhawvipul/taper`` (see SURVEY.md): reverse-mode autodiff, MLP/CNN
layers, losses, optimizers with LR scheduling, an MNIST pipeline, checkpointing,
and a full PTQ/QAT quantization subsystem.

Architecture stance (idiomatic TPU, not a port):

* The reference's dynamic gradient tape (``src/tape.rs``) is replaced by JAX
  tracing: forward + backward become ONE jitted XLA program per train step.
* The reference's SIMD elementwise ops / cache-blocked GEMM / im2col conv
  kernels (``src/tensor.rs``, ``src/gemm.rs``, ``src/ops.rs``) become Pallas
  kernels driving the MXU/VPU, behind a ``backend={'xla','pallas'}`` switch
  (mirroring the reference's pluggable BLAS feature flags).
* Optimizers are pure ``(init, update)`` function pairs with fused
  single-kernel Pallas parameter updates.
* Quantized weights live in HBM as int8/fp16 with dequant-on-load kernels;
  QAT uses ``jax.custom_vjp`` straight-through estimators.
"""

from taper_tpu import ops
from taper_tpu import nn
from taper_tpu import losses
from taper_tpu import optim
from taper_tpu import data
from taper_tpu import quantization
from taper_tpu import parallel
from taper_tpu.train import Trainer, Metrics
from taper_tpu.utils import checkpoint
from taper_tpu.serve import ServingEngine, offline_serve

__version__ = "0.1.0"

__all__ = [
    "ops",
    "nn",
    "losses",
    "optim",
    "data",
    "quantization",
    "parallel",
    "Trainer",
    "Metrics",
    "checkpoint",
    "ServingEngine",
    "offline_serve",
]
