"""Fake quantization for QAT (reference ``src/quantization/fake_quantize.rs``).

Forward: quantize → dequantize round trip so the network trains against
quantization noise (``fake_quantize.rs:118-172``).  Backward: straight-
through estimator — identity gradient — implemented as ``jax.custom_vjp``
(the reference pushes an identity closure onto its tape,
``fake_quantize.rs:138-158``; here the STE is part of the traced program).

Float16/BFloat16 simulation rounds the mantissa to 10/7 bits like the
reference (``fake_quantize.rs:176-233``) — realized exactly by casting
through the native dtype.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from taper_tpu.quantization.config import (
    QuantizationConfig, QuantizationSchema, QuantizationType,
)


@jax.custom_vjp
def ste_round(x):
    """round(x) with identity gradient (the STE core)."""
    return jnp.round(x)


ste_round.defvjp(lambda x: (jnp.round(x), None), lambda _, g: (g,))


@jax.custom_vjp
def ste_clip(x, lo, hi):
    """clip with identity gradient wrt x (full STE, not clipped-STE —
    matches the reference's unconditional identity backward)."""
    return jnp.clip(x, lo, hi)


ste_clip.defvjp(lambda x, lo, hi: (jnp.clip(x, lo, hi), None),
                lambda _, g: (g, None, None))


def fake_quantize_int(x, scale, zero_point, qmin: int, qmax: int):
    """Integer quantize-dequantize round trip with STE gradients.

    scale/zero_point are calibration state, not trainable — gradients stop
    at them (the reference never differentiates them either)."""
    scale = jax.lax.stop_gradient(scale)
    zero_point = jax.lax.stop_gradient(zero_point)
    q = ste_clip(ste_round(x / scale + zero_point), float(qmin), float(qmax))
    return (q - zero_point) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quantize_float(x, target: str):
    dtype = jnp.float16 if target == "float16" else jnp.bfloat16
    return x.astype(dtype).astype(jnp.float32)


fake_quantize_float.defvjp(
    lambda x, target: (fake_quantize_float(x, target), None),
    lambda target, _, g: (g,))


@jax.tree_util.register_pytree_with_keys_class
@dataclasses.dataclass
class FakeQuantize:
    """Stateful fake-quant op: scale/zero-point calibrated from observed
    min/max (``fake_quantize.rs:70-91``), train/eval switched by the
    ``apply`` flag.  A pytree, so it can live inside QAT layer params.

    The children are keyed ``fq_scale``/``fq_zero_point`` so optimizers can
    recognize and freeze them (calibration, not gradient descent, sets
    quantization ranges — matching the reference, where scale/zp are plain
    fields updated only by ``update_params``)."""

    scale: jnp.ndarray
    zero_point: jnp.ndarray
    config: QuantizationConfig

    def tree_flatten_with_keys(self):
        return (((jax.tree_util.GetAttrKey("fq_scale"), self.scale),
                 (jax.tree_util.GetAttrKey("fq_zero_point"),
                  self.zero_point)),
                (self.config,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    # -- construction ----------------------------------------------------
    @classmethod
    def create(cls, config: Optional[QuantizationConfig] = None
               ) -> "FakeQuantize":
        config = config or QuantizationConfig.int8(symmetric=True)
        return cls(jnp.float32(1.0), jnp.float32(0.0), config)

    # -- calibration (update_params, fake_quantize.rs:70-91) -------------
    def update_params(self, observed_min, observed_max) -> "FakeQuantize":
        rng = self.config.compute_range()
        if rng is None:
            return self
        qmin, qmax = rng
        observed_min = jnp.minimum(observed_min, 0.0)
        observed_max = jnp.maximum(observed_max, 0.0)
        if self.config.symmetric:
            amax = jnp.maximum(jnp.abs(observed_min), jnp.abs(observed_max))
            scale = jnp.maximum(amax / qmax, 1e-12)
            zp = jnp.zeros_like(scale)
        else:
            scale = jnp.maximum((observed_max - observed_min) / (qmax - qmin),
                                1e-12)
            zp = jnp.round(qmin - observed_min / scale)
        return FakeQuantize(jnp.asarray(scale, jnp.float32),
                            jnp.asarray(zp, jnp.float32), self.config)

    def calibrate(self, x) -> "FakeQuantize":
        """Set ranges from a live tensor.  ``schema=PER_CHANNEL`` reduces
        over every axis but 0 (output channels) with kept dims, so the
        resulting scale/zp broadcast against the weight — one range per
        output channel/row (matches ``config.rs:21-25`` done right; the
        reference declares PerChannel and never uses it)."""
        if self.config.schema == QuantizationSchema.PER_CHANNEL \
                and jnp.ndim(x) > 0:
            axes = tuple(range(1, jnp.ndim(x)))
            return self.update_params(
                jnp.min(x, axis=axes, keepdims=True),
                jnp.max(x, axis=axes, keepdims=True))
        return self.update_params(jnp.min(x), jnp.max(x))

    # -- forward ---------------------------------------------------------
    def apply(self, x, *, active: bool = True):
        if not active:
            return x  # eval pass-through (fake_quantize.rs:119-121)
        qt = self.config.qtype
        if qt in (QuantizationType.FLOAT16, QuantizationType.BFLOAT16):
            return fake_quantize_float(x, qt.value)
        rng = self.config.compute_range()
        if rng is None:
            raise ValueError(f"fake-quant unsupported for {qt}")
        qmin, qmax = rng
        return fake_quantize_int(x, self.scale, self.zero_point, qmin, qmax)
