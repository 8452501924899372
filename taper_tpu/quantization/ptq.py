"""Post-training quantization (reference PTQ flow: ``Module::quantize``
per layer, ``src/nn.rs:62-69, 336-345``; example ``examples/ptq_quantize.rs``).

``quantize_params`` walks a trained parameter pytree and replaces weight
leaves with :class:`QuantizedTensor` storage.  ``QuantizedModel`` wraps the
original module and dequantizes on the fly inside the (jitted) forward —
with int8 weights the Pallas backend runs the dequant **inside** the matmul
kernel (dequant-on-load from HBM, ``ops/pallas/quant.py``), so weights
never materialize in f32 in HBM.

Improvements over the reference: int4/NF4/bf16 actually work (the
reference's dequantizers return zeros), per-channel scales are honored, and
the whole quantized forward stays jit-compatible.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from taper_tpu.nn.module import Module
from taper_tpu.quantization.config import QuantizationConfig
from taper_tpu.quantization.qtensor import QuantizedTensor, quantize

# Leaves bigger than this get quantized; small biases stay f32 (quantizing
# a 10-element bias saves nothing and costs accuracy — the reference
# quantizes biases too, which is part of its reported accuracy drop).
_MIN_QUANT_SIZE = 64


def quantize_params(params: Any, config: QuantizationConfig,
                    min_size: int = _MIN_QUANT_SIZE) -> Any:
    """Replace float leaves (≥ min_size elems, ndim ≥ 2) with quantized
    storage.  Returns a pytree with QuantizedTensor leaves."""

    def q(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.size >= min_size
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return quantize(leaf, config)
        return leaf

    return jax.tree.map(q, params)


def dequantize_params(qparams: Any) -> Any:
    """QuantizedTensor leaves → f32 (pytree inverse of quantize_params)."""

    def dq(leaf):
        if isinstance(leaf, QuantizedTensor):
            return leaf.dequantize()
        return leaf

    return jax.tree.map(dq, qparams,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))


def quantized_bytes(qparams: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            qparams, is_leaf=lambda x: isinstance(x, QuantizedTensor)):
        if isinstance(leaf, QuantizedTensor):
            total += leaf.nbytes()
        elif hasattr(leaf, "size"):
            total += leaf.size * leaf.dtype.itemsize
    return total


class QuantizedModel(Module):
    """Inference wrapper: original module + quantized params.

    Mirrors the reference's ``QuantizedSequential`` (``nn.rs:160-177``) but
    stays functional: quantized leaves flow straight into the layer ops —
    int8 Linear weights hit the dequant-on-load Pallas kernel; everything
    else dequantizes on the fly inside the jitted forward (no stale-cache
    hazard like the reference's dequant cache, ``nn.rs:81-127``).
    """

    def __init__(self, module: Module):
        self.module = module

    def init(self, key):  # pragma: no cover - quantized models aren't init'ed
        raise NotImplementedError(
            "QuantizedModel wraps already-trained params; use "
            "quantize_params(trained_params, config)")

    def apply(self, qparams, x, *, train=False, rng=None):
        return self.module.apply(qparams, x, train=False, rng=None)


def quantize_model(module: Module, params: Any,
                   config: QuantizationConfig):
    """One-call PTQ: returns ``(QuantizedModel, qparams)`` — the analogue
    of the reference's ``model.quantize(&config)``."""
    return QuantizedModel(module), quantize_params(params, config)
