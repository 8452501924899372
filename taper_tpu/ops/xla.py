"""XLA-backed op implementations (the always-available correctness oracle).

Each function here corresponds to a kernel family in the reference:

* ``matmul``      — reference ``src/ops.rs:200-298`` (GEMM via ``src/gemm.rs``)
* ``linear``      — reference ``src/nn.rs:54-59`` (transpose + matmul + bias)
* ``conv2d``      — reference ``src/tensor.rs:1221-1285`` (im2col + GEMM)
* ``conv2d_relu`` — reference ``src/tensor.rs:1379-1389`` (fused Conv+ReLU)
* ``max_pool2d``  — reference ``src/tensor.rs:1391-1521``
* ``avg_pool2d``  — reference ``src/tensor.rs:1524-1660``
* elementwise     — reference ``src/ops.rs`` / ``src/tensor.rs`` SIMD module

Unlike the reference (whose conv weight/input gradients are severed — see
SURVEY.md §2.2 ⚠), everything here is fully differentiable via JAX tracing.

Layout: the public API is NCHW / OIHW to match the reference's tensor
contract; XLA re-lays out to the TPU-preferred tiling internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Elementwise (VPU)
# ---------------------------------------------------------------------------

def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def add(a, b):
    return a + b


def mul(a, b):
    return a * b


def fma(a, b, c):
    """``a*b + c`` — XLA fuses this into one VPU pass (reference
    ``src/tensor.rs:203-233`` ``fma_f32_simd``)."""
    return a * b + c


def sub(a, b):
    return a - b


def div(a, b):
    return a / b


# ---------------------------------------------------------------------------
# Matmul (MXU)
# ---------------------------------------------------------------------------

def matmul(a, b, *, precision=None):
    """2-D matmul ``[m,k] @ [k,n]`` with f32 accumulation on the MXU."""
    return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                      precision=precision)


def linear(x, w, b=None, *, activation=None):
    """``x @ w.T (+ b)`` with an optional fused activation epilogue.

    ``w`` is ``[out_features, in_features]`` exactly like the reference's
    ``Linear`` (``src/nn.rs:34-50``); XLA folds the transpose into the GEMM.
    """
    y = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if activation is not None:
        y = activation(y)
    return y


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

_CONV_DIMS = ("NCHW", "OIHW", "NCHW")


def conv2d(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1,
           activation=None):
    """2-D convolution, NCHW input / OIHW weight, optional fused epilogue.

    Grouped convolution maps to ``feature_group_count`` (the reference
    hand-slices channels per group, ``src/nn.rs:278-334``; XLA does this
    natively and keeps the whole op differentiable).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=_CONV_DIMS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    if activation is not None:
        y = activation(y)
    return y


def conv2d_relu(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1):
    """Fused Conv2d + bias + ReLU (the reference's headline fusion feature)."""
    return conv2d(x, w, b, stride=stride, padding=padding, groups=groups,
                  activation=relu)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def max_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    stride = kernel if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), (padding[0], padding[0]),
                 (padding[1], padding[1])),
    )


def avg_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    stride = kernel if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), (padding[0], padding[0]),
                 (padding[1], padding[1])),
    )
    if padding == (0, 0):
        return summed / (kernel[0] * kernel[1])
    # With padding, divide by the actual (edge-clipped) window sizes.
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(
        ones, 0.0, lax.add,
        window_dimensions=(1, 1, kernel[0], kernel[1]),
        window_strides=(1, 1, stride[0], stride[1]),
        padding=((0, 0), (0, 0), (padding[0], padding[0]),
                 (padding[1], padding[1])),
    )
    return summed / counts


def attention(q, k, v, *, causal=False, scale=None, window=None,
              segment_ids=None):
    """Scaled dot-product attention (oracle path).

    ``q, k, v``: ``[B, H, S, D]``.  Softmax statistics are computed in f32
    regardless of input dtype (bf16 inputs keep f32 logits/weights), the
    output is cast back to the input dtype.  ``segment_ids`` [B, S]
    (packed sequences): rows attend only same-id keys (requires
    Sq == Sk).

    Beyond-reference scope: the reference has no attention anywhere
    (SURVEY.md §5.7); this is the framework's transformer extension.  XLA
    materializes the ``[B, H, S, S]`` score matrix in HBM — the Pallas
    flash kernel (``pallas/attention.py``) streams it through VMEM instead.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if k.shape[1] != q.shape[1]:
        # GQA/MQA: broadcast the compact K/V heads up to the Q heads
        # (the flash kernel reads them natively; the oracle materializes)
        assert q.shape[1] % k.shape[1] == 0, (
            f"GQA needs H % Hkv == 0; got H={q.shape[1]}, "
            f"Hkv={k.shape[1]}")
        g = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, g, axis=1)
        v = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal or window is not None:
        sq, sk = q.shape[2], k.shape[2]
        rows = jnp.arange(sq)[:, None] + (sk - sq)
        cols = jnp.arange(sk)[None, :]
        mask = jnp.ones((sq, sk), bool)
        if causal:
            mask &= rows >= cols
        if window is not None:
            # row attends cols in [row-window+1, row]
            mask &= cols > rows - window
        s = jnp.where(mask, s, -jnp.inf)
    if segment_ids is not None:
        assert q.shape[2] == k.shape[2], (q.shape, k.shape)
        seg = jnp.asarray(segment_ids)
        same = seg[:, None, :, None] == seg[:, None, None, :]
        s = jnp.where(same, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return out.astype(q.dtype)
