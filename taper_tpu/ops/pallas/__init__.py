"""Pallas (MXU/VPU) kernel backend — see sibling modules for the kernels."""

from taper_tpu.ops.pallas.gemm import matmul, linear
from taper_tpu.ops.pallas.elementwise import (
    relu, sigmoid, add, mul, fma, sub, div,
)
from taper_tpu.ops.pallas.conv import conv2d, conv2d_relu
from taper_tpu.ops.pallas.pool import max_pool2d, avg_pool2d
from taper_tpu.ops.pallas.attention import attention, flash_attention

__all__ = [
    "matmul", "linear", "relu", "sigmoid", "add", "mul", "fma",
    "sub", "div",
    "conv2d", "conv2d_relu", "max_pool2d", "avg_pool2d",
    "attention", "flash_attention",
]
