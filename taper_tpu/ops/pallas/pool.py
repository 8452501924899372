"""Pallas pooling kernels.

TPU-native replacement for the reference's rayon-parallel pooling loops
(``src/tensor.rs:1391-1521`` max_pool2d with argmax capture, ``:1524-1660``
avg_pool2d).

Kernel formulation (Mosaic has no strided vector slices and no free-form
reshapes, so the classic "reshape into windows" trick doesn't tile):

* grid = (row_blocks,); each program holds a ``[br, H, W]`` plane in VMEM.
* **H pooling**: static unrolled max/sum over the kh sublane rows of each
  output row.
* **W pooling + lane downsampling** in one move: kw shift-select 0/1
  matmuls on the MXU (``S_s[l, c] = 1`` iff ``l == c*kw+s``) copy lane
  ``c*kw+s`` into output column ``c`` at ``Precision.HIGHEST`` (an exact
  f32 copy), and the window reduce is max/sum over those kw copies.
  Padding-safe: only logical lanes are selected.

Backward is a custom VJP (Pallas calls aren't auto-differentiable): avg
pool scatters the upsampled cotangent; max pool reuses XLA's
select-and-scatter (first-match argmax, same semantics as the reference's
captured argmax).

Only the non-overlapping stride==kernel, no-padding case (everything the
reference's models use, via ``MaxPool2d::new_2x2`` / global avg pools) runs
the Pallas kernel; other configs fall back to XLA ``reduce_window``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend
from taper_tpu.ops import xla as _xla


def _pool_kernel(x_ref, o_ref, *, kh, kw, ho, wo, mode):
    op = jnp.maximum if mode == "max" else jnp.add
    w = x_ref.shape[2]
    # Shift-select matmuls: S_s[l, c] = 1 iff l == c*kw + s — copies lane
    # c*kw+s into output column c.  An exact (0/1) copy on the MXU, safe
    # against lane padding (only logical lanes are ever selected), so the
    # W-window reduction is max/sum over the kw selected copies.
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, wo), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, wo), 1)
    sels = [(lane == col * kw + s).astype(jnp.float32) for s in range(kw)]
    dn = (((1,), (0,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST  # exact f32 copy through the MXU
    for j in range(ho):  # static unroll over output rows
        acc = x_ref[:, j * kh, :]
        for i in range(1, kh):
            acc = op(acc, x_ref[:, j * kh + i, :])  # H pooling (sublanes)
        out = jax.lax.dot_general(acc, sels[0], dn, precision=hi,
                                  preferred_element_type=jnp.float32)
        for s in range(1, kw):                      # W pooling via selects
            out = op(out, jax.lax.dot_general(
                acc, sels[s], dn, precision=hi,
                preferred_element_type=jnp.float32))
        if mode == "avg":
            out = out / (kh * kw)
        o_ref[:, j, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "mode"))
def _pool_pallas(x, *, kh, kw, mode):
    n, c, h, w = x.shape
    ho, wo = h // kh, w // kw
    rows = n * c
    xr = x.reshape(rows, h, w)
    # Trim ragged tails (floor semantics — matches reference output dims).
    if h != ho * kh or w != wo * kw:
        xr = xr[:, : ho * kh, : wo * kw]
    # Block rows sized against VMEM: lanes pad W→128 and sublanes pad
    # H→multiple of 8, so the true in-VMEM block cost is
    # br × roundup(H,8) × 128 × 4 bytes (double-buffered), plus the output.
    hp = -(-(ho * kh) // 8) * 8
    hop = -(-ho // 8) * 8
    per_row = (hp + hop) * 128 * 4 * 2  # in+out, double-buffered
    br = max(8, min(rows, (6 * 1024 * 1024 // per_row) // 8 * 8))
    out = pl.pallas_call(
        functools.partial(_pool_kernel, kh=kh, kw=kw, ho=ho, wo=wo,
                          mode=mode),
        grid=(-(-rows // br),),
        in_specs=[pl.BlockSpec((br, ho * kh, wo * kw), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((br, ho, wo), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, ho, wo), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(xr)
    return out.reshape(n, c, ho, wo)


def _upsample(g, kh, kw, h, w):
    """Repeat each pooled cell over its window, zero-padding ragged tails."""
    n, c, ho, wo = g.shape
    up = jnp.repeat(jnp.repeat(g, kh, axis=2), kw, axis=3)
    if ho * kh != h or wo * kw != w:
        up = jnp.pad(up, ((0, 0), (0, 0), (0, h - ho * kh),
                          (0, w - wo * kw)))
    return up


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_p(x, kh, kw):
    return _pool_pallas(x, kh=kh, kw=kw, mode="max")


def _max_pool_p_fwd(x, kh, kw):
    return _max_pool_p(x, kh, kw), x


def _max_pool_p_bwd(kh, kw, x, g):
    # Backward through XLA's select-and-scatter: first-match argmax
    # semantics (same as the reference's captured argmax,
    # tensor.rs:1435-1447) and ~4x cheaper than an explicit mask+tie-count
    # recomputation (measured: pallas pools cost 3.3 ms/step extra in the
    # scanned CNN epoch with the mask formulation).
    _, vjp = jax.vjp(
        lambda t: _xla.max_pool2d(t, kernel=(kh, kw), stride=(kh, kw)), x)
    return vjp(g)


_max_pool_p.defvjp(_max_pool_p_fwd, _max_pool_p_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _avg_pool_p(x, kh, kw):
    return _pool_pallas(x, kh=kh, kw=kw, mode="avg")


def _avg_pool_p_fwd(x, kh, kw):
    return _avg_pool_p(x, kh, kw), x.shape


def _avg_pool_p_bwd(kh, kw, shape, g):
    return (_upsample(g, kh, kw, shape[2], shape[3]) / (kh * kw),)


_avg_pool_p.defvjp(_avg_pool_p_fwd, _avg_pool_p_bwd)


def _eligible(x, kernel, stride, padding):
    kh, kw = kernel
    wo = x.shape[3] // kw if kw else 0
    # Measured dispatch (v5e, re-raced round 2 with the interleaved
    # harness): XLA's reduce_window emitter — windowed reductions in its
    # own internal layouts — runs MNIST-shaped pools at 15us/(sub-us when
    # fused) vs 0.7-1.6ms for this kernel, whose shift-select formulation
    # pays VPU relayouts on every sub-128-lane plane.  The kernel is kept
    # as a formulation study behind TAPER_POOL=pallas; all pools default
    # to XLA (round-1's W<=32 window no longer holds on this toolchain).
    if os.environ.get("TAPER_POOL", "xla") != "pallas":
        return False
    return (stride == kernel and padding == (0, 0)
            and x.shape[2] >= kh and x.shape[3] >= kw and 8 <= wo)


def max_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    kernel = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    stride = kernel if stride is None else (
        (stride, stride) if isinstance(stride, int) else tuple(stride))
    padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
    if _eligible(x, kernel, stride, padding):
        return _max_pool_p(x, kernel[0], kernel[1])
    return _xla.max_pool2d(x, kernel=kernel, stride=stride, padding=padding)


def avg_pool2d(x, *, kernel=(2, 2), stride=None, padding=(0, 0)):
    kernel = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    stride = kernel if stride is None else (
        (stride, stride) if isinstance(stride, int) else tuple(stride))
    padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
    if _eligible(x, kernel, stride, padding):
        return _avg_pool_p(x, kernel[0], kernel[1])
    return _xla.avg_pool2d(x, kernel=kernel, stride=stride, padding=padding)
