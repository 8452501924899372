"""Quantized tensors: real int8/int4/fp16/bf16/NF4 encode + decode.

Rebuild of the reference's ``QuantizedTensor`` (``src/tensor.rs:247-467``,
``:2084-2188``) with the stubs made real:

* int8  — affine (scale, zero_point), per-tensor or per-channel, matching
  the reference's min/max→scale/zp math (``tensor.rs:2110-2148``).
* int4  — same affine math over [-8, 7], **packed two nibbles per byte**
  (the reference's Int4 dequantizes to zeros, ``tensor.rs:387-390``).
* fp16 / bf16 — native JAX dtypes (the reference hand-rolls IEEE-754 bit
  conversion, ``tensor.rs:2191-2288``; on TPU bf16 is a hardware format).
* NF4  — the 16-level NormalFloat codebook with per-block absmax scaling
  (QLoRA-style; the reference's NF4 is a zero-returning stub,
  ``tensor.rs:458-461``).

``QuantizedTensor`` is a registered pytree, so quantized params flow through
jit / checkpoints / sharding like any other leaf structure.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu.quantization.config import (
    QuantizationConfig, QuantizationSchema, QuantizationType,
)

# NormalFloat4 codebook: 16 quantiles of N(0,1) normalized to [-1, 1].
# numpy (not jnp) on purpose: a module-level jnp.asarray initializes the
# XLA backend at import, which breaks pod programs that must call
# jax.distributed.initialize() before any backend touch.
NF4_CODE = np.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)

NF4_BLOCK = 64


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    values: jnp.ndarray               # storage (int8 / packed uint8 / fp16…)
    scale: jnp.ndarray                # per-tensor, per-channel or per-block
    zero_point: jnp.ndarray           # integer types only (0 elsewhere)
    qtype: QuantizationType
    schema: QuantizationSchema
    shape: Tuple[int, ...]            # original f32 shape

    def tree_flatten(self):
        return ((self.values, self.scale, self.zero_point),
                (self.qtype, self.schema, self.shape))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- sizes -----------------------------------------------------------
    def nbytes(self) -> int:
        return (self.values.size * self.values.dtype.itemsize
                + self.scale.size * self.scale.dtype.itemsize
                + self.zero_point.size * self.zero_point.dtype.itemsize)

    def compression_ratio(self) -> float:
        return (int(np.prod(self.shape)) * 4) / max(self.nbytes(), 1)

    def dequantize(self) -> jnp.ndarray:
        return dequantize(self)


def _minmax(x, per_channel: bool):
    if per_channel:
        axes = tuple(range(1, x.ndim))
        return (jnp.min(x, axis=axes), jnp.max(x, axis=axes))
    return jnp.min(x), jnp.max(x)


def _expand(v, x, per_channel: bool):
    if per_channel:
        return v.reshape((-1,) + (1,) * (x.ndim - 1))
    return v


def _pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (as int8 in [-8,7] or uint4 codes) pairwise."""
    flat = q.reshape(-1).astype(jnp.uint8) & 0xF
    if flat.shape[0] % 2:
        flat = jnp.pad(flat, (0, 1))
    lo = flat[0::2]
    hi = flat[1::2]
    return (hi << 4 | lo).astype(jnp.uint8)


def _unpack_nibbles(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    lo = packed & 0xF
    hi = packed >> 4
    flat = jnp.stack([lo, hi], axis=1).reshape(-1)[:n]
    return flat


def quantize(x: jnp.ndarray,
             config: QuantizationConfig) -> QuantizedTensor:
    """f32 tensor → QuantizedTensor (reference ``Tensor::quantize``,
    ``tensor.rs:2084-2107``)."""
    x = jnp.asarray(x, jnp.float32)
    per_ch = config.schema == QuantizationSchema.PER_CHANNEL
    qt = config.qtype

    if qt in (QuantizationType.FLOAT16, QuantizationType.BFLOAT16):
        dtype = jnp.float16 if qt == QuantizationType.FLOAT16 else jnp.bfloat16
        return QuantizedTensor(x.astype(dtype), jnp.float32(1.0),
                               jnp.int32(0), qt, config.schema, x.shape)

    if qt in (QuantizationType.FP8_E4M3, QuantizationType.FP8_E5M2):
        # Absmax-scaled fp8: divide by a scale chosen so the tensor's
        # max maps to the format's max (e4m3 ±448, e5m2 ±57344), then
        # round-to-nearest into 8 bits.  Per-channel honors the schema.
        import ml_dtypes
        dtype = (jnp.float8_e4m3fn if qt == QuantizationType.FP8_E4M3
                 else jnp.float8_e5m2)
        fmax = float(ml_dtypes.finfo(dtype).max)
        mn, mx = _minmax(x, per_ch)
        amax = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), 1e-12)
        scale = amax / fmax
        q = (x / _expand(scale, x, per_ch)).astype(dtype)
        return QuantizedTensor(q, scale, jnp.int32(0), qt,
                               config.schema, x.shape)

    if qt in (QuantizationType.INT8, QuantizationType.INT4):
        qmin, qmax = config.compute_range()
        mn, mx = _minmax(x, per_ch)
        if config.symmetric:
            amax = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
            scale = jnp.maximum(amax / qmax, 1e-12)
            zp = jnp.zeros_like(scale, jnp.int32)
        else:
            scale = jnp.maximum((mx - mn) / (qmax - qmin), 1e-12)
            zp = jnp.round(qmin - mn / scale).astype(jnp.int32)
        q = jnp.clip(jnp.round(x / _expand(scale, x, per_ch))
                     + _expand(zp, x, per_ch), qmin, qmax).astype(jnp.int8)
        if qt == QuantizationType.INT4:
            return QuantizedTensor(_pack_nibbles(q), scale, zp, qt,
                                   config.schema, x.shape)
        return QuantizedTensor(q, scale, zp, qt, config.schema, x.shape)

    if qt == QuantizationType.NF4:
        flat = x.reshape(-1)
        n = flat.shape[0]
        nb = -(-n // NF4_BLOCK)
        flat = jnp.pad(flat, (0, nb * NF4_BLOCK - n)).reshape(nb, NF4_BLOCK)
        absmax = jnp.maximum(jnp.max(jnp.abs(flat), axis=1, keepdims=True),
                             1e-12)
        normed = flat / absmax
        # nearest codebook entry per element
        idx = jnp.argmin(
            jnp.abs(normed[..., None] - NF4_CODE[None, None, :]),
            axis=-1).astype(jnp.uint8)
        packed = _pack_nibbles(idx)
        return QuantizedTensor(packed, absmax[:, 0], jnp.int32(0), qt,
                               config.schema, x.shape)

    raise ValueError(f"unsupported qtype {qt}")


def dequantize(qt: QuantizedTensor) -> jnp.ndarray:
    """QuantizedTensor → f32 (``tensor.rs:318-374``, with stubs fixed)."""
    t = qt.qtype
    if t in (QuantizationType.FLOAT16, QuantizationType.BFLOAT16):
        return qt.values.astype(jnp.float32)

    if t in (QuantizationType.FP8_E4M3, QuantizationType.FP8_E5M2):
        per_ch = qt.schema == QuantizationSchema.PER_CHANNEL
        v = qt.values.astype(jnp.float32)
        return v * _expand(qt.scale, v, per_ch)

    if t == QuantizationType.INT8:
        per_ch = qt.schema == QuantizationSchema.PER_CHANNEL
        q = qt.values.astype(jnp.float32)
        scale = _expand(qt.scale, q, per_ch)
        zp = _expand(qt.zero_point.astype(jnp.float32), q, per_ch)
        return (q - zp) * scale

    if t == QuantizationType.INT4:
        n = int(np.prod(qt.shape))
        codes = _unpack_nibbles(qt.values, n)
        # sign-extend 4-bit two's complement
        q = jnp.where(codes > 7, codes.astype(jnp.int32) - 16,
                      codes.astype(jnp.int32)).astype(jnp.float32)
        q = q.reshape(qt.shape)
        per_ch = qt.schema == QuantizationSchema.PER_CHANNEL
        scale = _expand(qt.scale, q, per_ch)
        zp = _expand(qt.zero_point.astype(jnp.float32), q, per_ch)
        return (q - zp) * scale

    if t == QuantizationType.NF4:
        n = int(np.prod(qt.shape))
        idx = _unpack_nibbles(qt.values, -(-n // NF4_BLOCK) * NF4_BLOCK)
        vals = jnp.asarray(NF4_CODE)[idx].reshape(-1, NF4_BLOCK) * qt.scale[:, None]
        return vals.reshape(-1)[:n].reshape(qt.shape)

    raise ValueError(f"unsupported qtype {t}")
