"""Pallas VPU elementwise kernels.

TPU-native replacement for the reference's hand-rolled SIMD module
(``src/tensor.rs:14-234``: AVX/SSE/NEON add/mul/fma) and the SSE ReLU fast
path (``src/ops.rs:312-350``).  On TPU the VPU (8×128 lanes) plays the role
of the CPU vector units; arrays are flattened, padded to lane tiles, and
processed in VMEM-resident blocks.

These exist mainly to mirror the reference's "kernel backend" layer and for
fusion experiments — in practice XLA fuses elementwise chains automatically,
which is why the default backend is 'xla'.  Gradients come from
``jax.custom_vjp`` with the same analytic formulas as the reference tape
closures (``src/ops.rs:8-120``, ``:358-370``; ``src/tensor.rs:594-634``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend

_LANES = 128
_BLOCK_ROWS = 512  # 512×128 f32 = 256 KiB per block in VMEM


def _to_tiles(x):
    """Flatten to [rows, 128], padding the tail; return array + true size."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    rows = max(1, -(-n // _LANES))
    rows_p = -(-rows // 8) * 8
    flat = jnp.pad(flat, (0, rows_p * _LANES - n))
    return flat.reshape(rows_p, _LANES), n


def _ew_call(kernel, *arrays):
    # Binary kernels index all operands with one tiling, so shapes must
    # already agree here; ``add``/``mul`` broadcast before dispatching.
    for a in arrays[1:]:
        assert a.shape == arrays[0].shape, (a.shape, arrays[0].shape)
    tiled, n = _to_tiles(arrays[0])
    tiles = [tiled] + [_to_tiles(a)[0] for a in arrays[1:]]
    rows = tiled.shape[0]
    br = min(_BLOCK_ROWS, rows)
    grid = (-(-rows // br),)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, _LANES), lambda i: (i, 0))
                  for _ in tiles],
        out_specs=pl.BlockSpec((br, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(tiled.shape, tiled.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*tiles)
    return out.reshape(-1)[:n].reshape(arrays[0].shape)


def _relu_kernel(x_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:], 0.0)


def _sigmoid_kernel(x_ref, o_ref):
    o_ref[:] = jax.nn.sigmoid(x_ref[:])


def _add_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] * b_ref[:]


def _fma_kernel(a_ref, b_ref, c_ref, o_ref):
    o_ref[:] = a_ref[:] * b_ref[:] + c_ref[:]


def _sub_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] - b_ref[:]


def _div_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] / b_ref[:]


@jax.custom_vjp
def relu(x):
    return _ew_call(_relu_kernel, x)


def _relu_fwd(x):
    y = relu(x)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, 0.0),)


relu.defvjp(_relu_fwd, _relu_bwd)


@jax.custom_vjp
def sigmoid(x):
    return _ew_call(_sigmoid_kernel, x)


def _sigmoid_fwd(x):
    y = sigmoid(x)
    return y, y


def _sigmoid_bwd(y, g):
    return (g * y * (1.0 - y),)


sigmoid.defvjp(_sigmoid_fwd, _sigmoid_bwd)


@jax.custom_vjp
def _add_eq(a, b):
    return _ew_call(_add_kernel, a, b)


def _add_fwd(a, b):
    return _add_eq(a, b), None


def _add_bwd(_, g):
    return g, g


_add_eq.defvjp(_add_fwd, _add_bwd)


@jax.custom_vjp
def _mul_eq(a, b):
    return _ew_call(_mul_kernel, a, b)


def _mul_fwd(a, b):
    return _mul_eq(a, b), (a, b)


def _mul_bwd(res, g):
    a, b = res
    return g * b, g * a


_mul_eq.defvjp(_mul_fwd, _mul_bwd)


@jax.custom_vjp
def _fma_eq(a, b, c):
    return _ew_call(_fma_kernel, a, b, c)


def _fma_fwd(a, b, c):
    return _fma_eq(a, b, c), (a, b)


def _fma_bwd(res, g):
    a, b = res
    return g * b, g * a, g


_fma_eq.defvjp(_fma_fwd, _fma_bwd)


@jax.custom_vjp
def _sub_eq(a, b):
    return _ew_call(_sub_kernel, a, b)


def _sub_fwd(a, b):
    return _sub_eq(a, b), None


def _sub_bwd(_, g):
    # reference Sub grad: (+g, −g) (src/ops.rs:377-416)
    return g, -g


_sub_eq.defvjp(_sub_fwd, _sub_bwd)


@jax.custom_vjp
def _div_eq(a, b):
    return _ew_call(_div_kernel, a, b)


def _div_fwd(a, b):
    return _div_eq(a, b), (a, b)


def _div_bwd(res, g):
    # reference Div grad: ga = g/b, gb = −g·a/b² (src/ops.rs:440-496)
    a, b = res
    return g / b, -g * a / (b * b)


_div_eq.defvjp(_div_fwd, _div_bwd)


def add(a, b):
    """Broadcasting add matching the xla backend's semantics; the broadcast
    happens outside the custom_vjp so JAX reduces gradients over the
    broadcast dimensions."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    return _add_eq(a, b)


def mul(a, b):
    """Broadcasting multiply; see :func:`add`."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    return _mul_eq(a, b)


def fma(a, b, c):
    """Fused multiply-add ``a*b + c`` in a single VPU pass — the TPU
    counterpart of the reference's ``fma_f32_simd``
    (``src/tensor.rs:203-233``, AVX ``_mm256_fmadd_ps``)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    if not (a.shape == b.shape == c.shape):
        a, b, c = jnp.broadcast_arrays(a, b, c)
    return _fma_eq(a, b, c)


def sub(a, b):
    """Broadcasting subtract (reference ``src/ops.rs:377-416``); see
    :func:`add` for the broadcast/grad-reduction contract."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    return _sub_eq(a, b)


def div(a, b):
    """Broadcasting divide (reference ``src/ops.rs:440-496``)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    return _div_eq(a, b)
