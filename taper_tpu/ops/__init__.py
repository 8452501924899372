"""Op library with a pluggable kernel backend.

Public compute surface of the framework (the analogue of the reference's
``src/ops.rs`` + ``src/tensor.rs`` op inventory).  Every op dispatches to the
active backend — ``'xla'`` (jnp/lax, XLA-fused; the correctness oracle) or
``'pallas'`` (hand-written MXU/VPU kernels) — selected via
:func:`set_backend` / :func:`use_backend`, mirroring the reference's
cargo-feature GEMM backend switch (``Cargo.toml:22-29``).

All ops are differentiable through JAX tracing; the Pallas ops carry
``jax.custom_vjp`` rules whose formulas match the reference tape closures.
"""

from __future__ import annotations

import os

from taper_tpu.ops.backend import (
    set_backend, get_backend, use_backend, on_tpu,
)
from taper_tpu.ops import xla as _xla


def _impl():
    if get_backend() == "pallas":
        from taper_tpu.ops import pallas as _pl
        return _pl
    return _xla


# -- elementwise -------------------------------------------------------------

def relu(x):
    return _impl().relu(x)


def sigmoid(x):
    return _impl().sigmoid(x)


def add(a, b):
    return _impl().add(a, b)


def mul(a, b):
    return _impl().mul(a, b)


def fma(a, b, c):
    """Fused multiply-add ``a*b + c`` (reference ``fma_f32_simd``,
    ``src/tensor.rs:203-233``)."""
    return _impl().fma(a, b, c)


def sub(a, b):
    """Elementwise subtract (reference ``src/ops.rs:377-496`` Sub
    overloads; grad (+g, −g))."""
    return _impl().sub(a, b)


def div(a, b):
    """Elementwise divide (reference ``src/ops.rs:440-496`` Div
    overloads; grad (g/b, −g·a/b²))."""
    return _impl().div(a, b)


# -- matmul / linear ---------------------------------------------------------

def matmul(a, b):
    """2-D ``[m,k] @ [k,n]`` (reference ``src/ops.rs:200-298``)."""
    return _impl().matmul(a, b)


def _is_qtensor(w):
    from taper_tpu.quantization.qtensor import QuantizedTensor
    return isinstance(w, QuantizedTensor)


def _dequant(w):
    if w is None or not _is_qtensor(w):
        return w
    return w.dequantize()


# tri-state: "1" forces the hand q8 kernel at every shape, "0" forces
# the XLA fused-dequant path, unset -> shape-aware measured dispatch.
_Q8_KERNEL = os.environ.get("TAPER_Q8_KERNEL")
_W8A8 = os.environ.get("TAPER_W8A8")


def linear(x, w, b=None, *, activation=None):
    """Fused ``x @ wᵀ (+ b) (+ activation)`` with ``w``: ``[out, in]``.

    ``w`` may be a :class:`QuantizedTensor`: the inline dequantize below is
    FUSED by XLA into the GEMM's read pipeline — int8 weights never
    materialize in f32 in HBM, and the fused form runs at HBM roofline
    (measured v5e, weights [8192,8192] @ batch 128: 0.068 ms ≈ 936 GB/s of
    int8 reads vs 0.20 ms for the f32 weights — a real 2.9× serving
    speedup from quantization).  The hand-written Pallas dequant-on-load
    kernel (``ops/pallas/quant.py``) implements the same contract
    explicitly; under the pallas backend dispatch is shape-aware (the
    kernel wins serving batches M≥64, XLA's fusion wins the decode
    matvec) — ``TAPER_Q8_KERNEL=1``/``=0`` force either path.
    """
    if _is_qtensor(w):
        from taper_tpu.quantization.config import QuantizationType
        b = _dequant(b)
        name = (activation if isinstance(activation, str)
                else "none" if activation is None
                else getattr(activation, "__name__", "none"))
        # Shape-aware measured dispatch (v5e): the hand q8 kernel wins
        # at serving batches (M=128: 107us vs 125us) but loses the
        # single-token decode matvec (M=8: 675us vs 501us for XLA's
        # fused dequant) — so it engages from M>=64 under the pallas
        # backend; TAPER_Q8_KERNEL=1 forces it at any shape.
        # W8A8 (opt-in, TAPER_W8A8=1): dynamic per-row activation quant
        # + the MXU's NATIVE int8 path (285 vs 157 TOP/s on v5e) for
        # COMPUTE-bound shapes; decode matvecs stay dequant-on-load
        # (bandwidth-bound — int8 compute buys nothing there).  Opt-in
        # because activation rounding changes numerics (~0.4%/element).
        # Read at TRACE time (unlike import-time _Q8_KERNEL) so A/B
        # benches can flip it per-contender; r5 found the import-time
        # read made bench_w8a8_prefill's "w8a8" row silently rerun the
        # dequant-on-load path.
        if (w.qtype == QuantizationType.INT8
                and os.environ.get("TAPER_W8A8", _W8A8 or "") == "1"
                and x.shape[0] >= 256):
            from taper_tpu.ops.pallas import quant as _q
            name8 = (activation if isinstance(activation, str)
                     else "none" if activation is None
                     else getattr(activation, "__name__", "none"))
            return _q.linear_w8a8(x, w.values, w.scale, w.zero_point,
                                  b, epilogue=name8)
        if (w.qtype == QuantizationType.INT8
                and get_backend() == "pallas"
                and (_Q8_KERNEL == "1"
                     or (_Q8_KERNEL != "0" and x.shape[0] >= 64))):
            from taper_tpu.ops.pallas import quant as _q
            if b is None:
                return _q.linear_q8(x, w.values, w.scale, w.zero_point,
                                    None, epilogue=name, has_bias=False)
            return _q.linear_q8(x, w.values, w.scale, w.zero_point, b,
                                epilogue=name, has_bias=True)
        # int4 has NO viable XLA path: the nibble-interleave dequantize
        # lowers to a 356 ms/step catastrophe at decode (vs 740us for
        # the kernel) — on real TPUs the kernel is used under any
        # backend; CPU keeps the jnp fallback as the oracle.
        if (w.qtype == QuantizationType.INT4 and w.shape[1] % 2 == 0
                and (on_tpu()
                     or (_Q8_KERNEL == "1"
                         and get_backend() == "pallas"))):
            from taper_tpu.ops.pallas import quant as _q
            return _q.linear_q4(x, w.values, w.scale, w.zero_point, b,
                                n_features=w.shape[1], epilogue=name,
                                has_bias=b is not None)
        w = w.dequantize()
        return linear(x, w, b, activation=activation)
    impl = _impl()
    if impl is _xla:
        act = {None: None, "none": None,
               "relu": _xla.relu, "sigmoid": _xla.sigmoid}[
                   activation if isinstance(activation, (str, type(None)))
                   else getattr(activation, "__name__", None)]
        return _xla.linear(x, w, b, activation=act)
    name = activation if isinstance(activation, str) else (
        "none" if activation is None
        else getattr(activation, "__name__", "none"))
    if b is None:
        y = impl.matmul(x, w.T)
        if name == "relu":
            y = relu(y)
        elif name == "sigmoid":
            y = sigmoid(y)
        return y
    return impl.linear(x, w, b, name)


# -- conv / pool -------------------------------------------------------------

def conv2d(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1,
           activation=None):
    if isinstance(activation, str):
        activation = {"none": None, "relu": _xla.relu,
                      "sigmoid": _xla.sigmoid}[activation]
    w, b = _dequant(w), _dequant(b)
    return _impl().conv2d(x, w, b, stride=stride, padding=padding,
                          groups=groups, activation=activation)


def conv2d_relu(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1):
    w, b = _dequant(w), _dequant(b)
    return _impl().conv2d_relu(x, w, b, stride=stride, padding=padding,
                               groups=groups)


def max_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    return _impl().max_pool2d(x, kernel=kernel, stride=stride,
                              padding=padding)


def avg_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    return _impl().avg_pool2d(x, kernel=kernel, stride=stride,
                              padding=padding)


def attention(q, k, v, *, causal=False, scale=None, window=None,
              segment_ids=None):
    """Scaled dot-product attention over ``[B, H, S, D]`` (beyond-reference
    transformer extension — SURVEY.md §5.7 notes the reference has none).
    The pallas backend runs the flash kernel (O(S·D) HBM traffic); xla
    materializes the S×S score matrix.  ``window=W`` bounds the lookback
    to W positions; with ``causal=True`` that is sliding-window (local)
    attention over the last W positions — without causal, future
    positions stay visible.  ``segment_ids`` [B, S] (packed-sequence
    training) masks attention to same-segment keys on both backends."""
    return _impl().attention(q, k, v, causal=causal, scale=scale,
                             window=window, segment_ids=segment_ids)


def attention_bshd(q, k, v, num_heads, *, causal=False, scale=None):
    """Attention in the PROJECTION layout: ``q`` [B, S, H·D], ``k``/``v``
    [B, S, Hkv·D], output [B, S, H·D] — the layout the QKV projection
    GEMMs produce and the output projection consumes.  On the pallas
    backend with lane-aligned shapes (D % 128 == 0, S % 128 == 0,
    S ≥ TAPER_FLASH_MIN) this runs the flash kernels DIRECTLY on the
    fused-head layout (index maps slice each head out of the lane dim),
    eliminating the [B,S,HD] ↔ [B,H,S,D] relayout copies around every
    attention call; otherwise it transposes and defers to
    :func:`attention` (numerically identical)."""
    import os

    b, s, e = q.shape
    d = e // num_heads
    min_sk = int(os.environ.get("TAPER_FLASH_MIN", "1024"))
    if (get_backend() == "pallas" and d % 128 == 0 and e % num_heads == 0
            and s % 128 == 0 and s >= min_sk):
        from taper_tpu.ops.pallas.attention import flash_attention_bshd
        return flash_attention_bshd(q, k, v, num_heads, causal=causal,
                                    scale=scale)
    hkv = k.shape[-1] // d
    q4 = q.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    k4 = k.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
    v4 = v.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
    o = attention(q4, k4, v4, causal=causal, scale=scale)
    return o.transpose(0, 2, 1, 3).reshape(b, s, e)


__all__ = [
    "set_backend", "get_backend", "use_backend", "on_tpu",
    "relu", "sigmoid", "add", "mul", "fma", "sub", "div", "matmul",
    "linear",
    "conv2d", "conv2d_relu", "max_pool2d", "avg_pool2d", "attention",
    "attention_bshd",
]
