"""Fused single-kernel optimizer updates (Pallas, VPU).

The reference updates parameters with per-tensor Rust loops over ``Vec<f32>``
m/v state (``src/optim.rs:83-113``).  The TPU-native design flattens the whole
parameter pytree into ONE 1-D vector (``jax.flatten_util.ravel_pytree``) and
runs ONE Pallas kernel per step that streams param/grad/m/v through VMEM and
writes the updated state in place (``input_output_aliases``).  This is the
BASELINE.json "fused single-kernel parameter update" north-star item —
implemented and parity-tested, but NOT the default: the ravel/pad/unravel
copies feeding the flat vector triple the step's HBM traffic, so XLA's
per-leaf fused tree update (optim.py) wins at every size on v5e (measured
via benchmarks/tune_all.py adam; the kernel itself is at roofline).

Hyper-parameters (lr, bias-corrected step size) arrive as SMEM scalars so a
changing learning-rate schedule never recompiles the kernel.

The non-trainable mask (BatchNorm running stats, fake-quant calibration) is
a *static* property of the parameter tree, so the common all-trainable case
compiles a maskless kernel: measured on v5e at 24M params, dropping the
mask stream and its three ``where`` selects is ~2.6× faster
(0.40 ms vs 1.05 ms per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend

_LANES = 128
_BLOCK_ROWS = 2048  # 2048x128 f32 = 1 MiB per operand block
_SEMANTICS = "arbitrary"
# Tuned on v5e at 24M params via benchmarks/tune_all.py adam (block rows
# and grid semantics are re-sweepable; they are static jit args so changing
# the globals retraces).


def _tile(x):
    n = x.shape[0]
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8
    return jnp.pad(x, (0, rows * _LANES - n)).reshape(rows, _LANES), n


def _adam_kernel(scal_ref, p_ref, g_ref, m_ref, v_ref, *rest,
                 b1, b2, eps, wd, decoupled, masked):
    if masked:
        mask_ref, po_ref, mo_ref, vo_ref = rest
    else:
        po_ref, mo_ref, vo_ref = rest
    lr = scal_ref[0]
    # Bias-corrected step size is precomputed on the host side of the jit
    # (Mosaic has no pow with a traced exponent) and arrives via SMEM.
    step_size = scal_ref[1]
    p, g = p_ref[:], g_ref[:]
    if wd != 0.0 and not decoupled:
        g = g + wd * p                     # L2-style decay (Adam, optim.rs:100)
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * g * g
    if wd != 0.0 and decoupled:
        p = p * (1.0 - lr * wd)            # decoupled decay (AdamW, :147-156)
    new_p = p - step_size * m / (jnp.sqrt(v) + eps)
    if masked:
        mask = mask_ref[:]
        po_ref[:] = jnp.where(mask > 0, new_p, p_ref[:])
        mo_ref[:] = jnp.where(mask > 0, m, m_ref[:])
        vo_ref[:] = jnp.where(mask > 0, v, v_ref[:])
    else:
        po_ref[:] = new_p
        mo_ref[:] = m
        vo_ref[:] = v


def _sgd_kernel(scal_ref, p_ref, g_ref, m_ref, *rest,
                momentum, wd, masked):
    if masked:
        mask_ref, po_ref, mo_ref = rest
    else:
        po_ref, mo_ref = rest
    lr = scal_ref[0]
    p, g = p_ref[:], g_ref[:]
    if wd != 0.0:
        g = g + wd * p
    if momentum != 0.0:
        m = momentum * m_ref[:] + g
        upd = m
    else:
        m = m_ref[:]
        upd = g
    if masked:
        mask = mask_ref[:]
        po_ref[:] = jnp.where(mask > 0, p - lr * upd, p)
        mo_ref[:] = jnp.where(mask > 0, m, m_ref[:])
    else:
        po_ref[:] = p - lr * upd
        mo_ref[:] = m


def adam_update_flat(p, g, m, v, mask, lr, step, *, b1, b2, eps, wd,
                     decoupled):
    """One fused Adam/AdamW step over flat 1-D param/grad/state vectors.

    ``mask`` may be None (all leaves trainable) — the maskless kernel is
    ~2.6× faster (see module docstring)."""
    return _adam_update_flat_jit(p, g, m, v, mask, lr, step, b1=b1, b2=b2,
                                 eps=eps, wd=wd, decoupled=decoupled,
                                 block_rows=_BLOCK_ROWS,
                                 semantics=_SEMANTICS)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd",
                                             "decoupled", "block_rows",
                                             "semantics"))
def _adam_update_flat_jit(p, g, m, v, mask, lr, step, *, b1, b2, eps, wd,
                          decoupled, block_rows, semantics):
    masked = mask is not None
    (pt, n), (gt, _), (mt, _), (vt, _) = (
        _tile(p), _tile(g), _tile(m), _tile(v))
    rows = pt.shape[0]
    br = min(block_rows, rows)
    step_size = lr * jnp.sqrt(1.0 - b2 ** step) / (1.0 - b1 ** step)
    scal = jnp.stack([lr, step_size]).astype(jnp.float32)
    spec = pl.BlockSpec((br, _LANES), lambda i: (i, 0))
    args = [scal, pt, gt, mt, vt]
    n_tensor_in = 4
    if masked:
        args.append(_tile(mask)[0])
        n_tensor_in = 5
    po, mo, vo = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps, wd=wd,
                          decoupled=decoupled, masked=masked),
        grid=(-(-rows // br),),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [spec] * n_tensor_in),
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct(pt.shape, jnp.float32)
                        for _ in range(3)),
        input_output_aliases={1: 0, 3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,),
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(po), flat(mo), flat(vo)


@functools.partial(jax.jit, static_argnames=("momentum", "wd"))
def sgd_update_flat(p, g, m, mask, lr, *, momentum, wd):
    """One fused SGD(+momentum) step over flat vectors (mask optional)."""
    masked = mask is not None
    (pt, n), (gt, _), (mt, _) = (_tile(p), _tile(g), _tile(m))
    rows = pt.shape[0]
    br = min(_BLOCK_ROWS, rows)
    scal = jnp.stack([lr, lr]).astype(jnp.float32)
    spec = pl.BlockSpec((br, _LANES), lambda i: (i, 0))
    args = [scal, pt, gt, mt]
    n_tensor_in = 3
    if masked:
        args.append(_tile(mask)[0])
        n_tensor_in = 4
    po, mo = pl.pallas_call(
        functools.partial(_sgd_kernel, momentum=momentum, wd=wd,
                          masked=masked),
        grid=(-(-rows // br),),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [spec] * n_tensor_in),
        out_specs=(spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct(pt.shape, jnp.float32)
                        for _ in range(2)),
        input_output_aliases={1: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    flat = lambda a: a.reshape(-1)[:n]
    return flat(po), flat(mo)
