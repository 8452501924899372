"""Pallas convolution path: im2col + fused MXU GEMM epilogue.

TPU-native replacement for the reference's convolution engine
(``src/tensor.rs:1221-1285``: im2col + GEMM; specializations at
``:1728-1780`` (3×3 rayon), ``:1784-1802`` (1×1 memcpy→matmul), and the fused
``conv2d_relu`` at ``:1379-1389``).

Design: patch extraction is a strided-slice gather that XLA lays out well;
the FLOPs live in the GEMM, which runs through the tiled Pallas MXU kernel
from ``gemm.py`` with the bias + ReLU epilogue fused into the final K-step
(so the conv output never round-trips HBM before activation).  The 1×1 path
skips patch extraction entirely and is a pure reshape + fused GEMM, matching
the reference's 1×1-as-matmul specialization.

**Dispatch policy (measured — the default):** stride-1 convs with
C·kh·kw ≤ 4096 route to XLA's native conv emitter, which wins at EVERY
measured channel count — 3-40× at C < 128 (the direct kernel's patch
assembly is VPU-relayout-bound there, ``conv_direct.py``'s formulation
study) and still ~3× at lane-aligned C ∈ {128, 256}, where the direct
kernel recovers to 55-80 TFLOP/s but the emitter's windowed MXU feeds
run 206-217 effective (``benchmarks/probe_conv_c128.py``, v5e
interleaved races, n_hi=400).  Strided/huge-K convs take the
materialized im2col + fused Pallas GEMM below; 1×1 convs are pure
channel-mixing fused GEMMs.  ``TAPER_CONV=direct`` forces the hand
kernel at every stride-1 shape (all-kernels mode, round-2's default);
``TAPER_CONV=xla`` forces the emitter.

Unlike the reference — whose conv weight/input grads are severed (SURVEY.md
§2.2 ⚠) — every path is fully differentiable: patches are extracted with
differentiable XLA ops and the Pallas GEMM carries a custom VJP.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from taper_tpu.ops.pallas import gemm as _mm


def _as_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _extract_patches(x, kh, kw, stride, padding):
    """NCHW → [N·Ho·Wo, C·kh·kw] patch matrix (differentiable)."""
    n, c, h, w = x.shape
    sh, sw = stride
    ph, pw = padding
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        h, w = h + 2 * ph, w + 2 * pw
    ho = (h - kh) // sh + 1
    wo = (w - kw) // sw + 1
    # Gather kh·kw strided views; stacking order (c, kh, kw) matches the
    # reference's im2col column layout (src/tensor.rs:1663-1726).
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(lax.slice(
                x, (0, 0, i, j),
                (n, c, i + (ho - 1) * sh + 1, j + (wo - 1) * sw + 1),
                (1, 1, sh, sw)))  # [N, C, Ho, Wo]
    patches = jnp.stack(cols, axis=2)           # [N, C, kh·kw, Ho, Wo]
    patches = patches.transpose(0, 3, 4, 1, 2)  # [N, Ho, Wo, C, kh·kw]
    return patches.reshape(n * ho * wo, c * kh * kw), ho, wo


def conv2d(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1,
           activation=None):
    """NCHW conv via im2col + fused Pallas GEMM. ``w`` is OIHW."""
    stride, padding = _as_pair(stride), _as_pair(padding)
    epilogue = "none"
    if activation is not None:
        name = getattr(activation, "__name__", str(activation))
        if "relu" in name:
            epilogue = "relu"
        elif "sigmoid" in name:
            epilogue = "sigmoid"
        else:
            raise ValueError(f"unsupported fused activation {name!r}")

    if groups != 1:
        # Grouped conv: per-group im2col+GEMM (reference slices channels the
        # same way, src/nn.rs:278-334 — but here each slice stays on tape).
        n, c, _, _ = x.shape
        o = w.shape[0]
        xg = jnp.split(x, groups, axis=1)
        wg = jnp.split(w, groups, axis=0)
        bg = jnp.split(b, groups) if b is not None else [None] * groups
        outs = [conv2d(xi, wi, bi, stride=stride, padding=padding,
                       activation=activation)
                for xi, wi, bi in zip(xg, wg, bg)]
        return jnp.concatenate(outs, axis=1)

    n, c, h, wdim = x.shape
    o, ci, kh, kw = w.shape
    assert ci == c, (x.shape, w.shape)

    # Stride-1 convs: measured dispatch (default) — XLA's emitter wins
    # at every probed channel count (see module docstring), so it is
    # the default; TAPER_CONV=direct forces the hand kernel everywhere
    # (all-kernels mode, the round-2 default), TAPER_CONV=xla is the
    # explicit spelling of the default.
    if ((kh, kw) != (1, 1) and stride == (1, 1)
            and c * kh * kw <= 4096):
        if os.environ.get("TAPER_CONV", "") == "direct":
            from taper_tpu.ops.pallas.conv_direct import conv2d_direct
            return conv2d_direct(x, w, b, padding, epilogue)
        from taper_tpu.ops import xla as _xla
        return _xla.conv2d(x, w, b, stride=stride, padding=padding,
                           activation=activation)

    if (kh, kw) == (1, 1) and stride == (1, 1) and padding == (0, 0):
        # 1×1 fast path: pure channel-mixing matmul.
        xm = x.transpose(0, 2, 3, 1).reshape(n * h * wdim, c)
        ho, wo = h, wdim
        wm = w.reshape(o, c)
    else:
        xm, ho, wo = _extract_patches(x, kh, kw, stride, padding)
        wm = w.reshape(o, c * kh * kw)

    if b is not None:
        y = _mm.linear(xm, wm, b, epilogue)           # [N·Ho·Wo, O]
    else:
        y = _mm.linear_nb(xm, wm, epilogue)
    return y.reshape(n, ho, wo, o).transpose(0, 3, 1, 2)


def _relu(x):
    return jnp.maximum(x, 0.0)


def conv2d_relu(x, w, b=None, *, stride=(1, 1), padding=(0, 0), groups=1):
    return conv2d(x, w, b, stride=stride, padding=padding, groups=groups,
                  activation=_relu)
