"""Pallas MXU matmul + fused linear kernels.

TPU-native replacement for the reference's GEMM backend
(``src/gemm.rs:8-129``: CBLAS / matrixmultiply behind a feature flag) and the
``Linear`` forward (``src/nn.rs:54-59``: transpose + matmul + add_broadcast as
three tape ops).  Here the whole layer — ``x @ W.T + b`` with an optional ReLU
epilogue — is ONE tiled Pallas kernel: the MXU does the contraction, and the
bias add + activation run on the VPU while the tile is still in VMEM (the
fusion the reference approximates with ``conv2d_relu``-style hand fusion).

Backward passes are expressed with the same tiled kernel via
``jax.custom_vjp`` (dX = g @ W, dW = gᵀ @ X, db = Σg — the hand formulas in
reference ``src/ops.rs:238-294``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(dim: int, pref: int, align: int) -> int:
    """Block size: the preferred tile, shrunk (aligned) for small dims."""
    if dim >= pref:
        return pref
    return _round_up(dim, align)


def _pad2(x, m_to, n_to):
    m, n = x.shape
    if m == m_to and n == n_to:
        return x
    return jnp.pad(x, ((0, m_to - m), (0, n_to - n)))


# ---------------------------------------------------------------------------
# Core tiled kernel:  out[bm, bn] += a[bm, bk] ·k b[bn, bk]ᵀ   (contract on k)
# ``b`` arrives as [N, K] (row-major weights, reference layout) so no
# transpose materialises anywhere — dot_general contracts dim 1 with dim 1.
# ---------------------------------------------------------------------------

def _linear_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, n_k: int,
                   epilogue: str):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        acc = acc_ref[:]
        if b_ref is not None:
            acc = acc + b_ref[:]
        if epilogue == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif epilogue == "sigmoid":
            acc = jax.nn.sigmoid(acc)
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("epilogue", "has_bias"))
def _linear_pallas_raw(x, w, b, *, epilogue: str = "none",
                       has_bias: bool = True):
    """y[M,N] = x[M,K] @ w[N,K]ᵀ (+ b[N]) (+ activation)."""
    M, K = x.shape
    N, K2 = w.shape
    assert K == K2, (x.shape, w.shape)

    bm = _pick_block(M, 128, 8)
    bn = _pick_block(N, 128, 128)
    bk = _pick_block(K, 512, 128)

    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    xp = _pad2(x, Mp, Kp)
    wp = _pad2(w, Np, Kp)
    n_k = Kp // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
    ]
    args = [xp, wp]
    if has_bias:
        bp = jnp.pad(b, (0, Np - N)).reshape(1, Np)
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        args.append(bp)
        kernel = functools.partial(_linear_kernel, n_k=n_k, epilogue=epilogue)
    else:
        def kernel(x_ref, w_ref, o_ref, acc_ref):
            _linear_kernel(x_ref, w_ref, None, o_ref, acc_ref, n_k=n_k,
                           epilogue=epilogue)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=4 * (Mp * Kp + Np * Kp + Mp * Np),
            transcendentals=0,
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out


# ---------------------------------------------------------------------------
# Public differentiable ops
# ---------------------------------------------------------------------------

@jax.custom_vjp
def matmul(a, b):
    """2-D ``a[M,K] @ b[K,N]`` on the MXU (Pallas backend)."""
    return _linear_pallas_raw(a, b.T, None, epilogue="none", has_bias=False)


def _matmul_fwd(a, b):
    return matmul(a, b), (a, b)


def _matmul_bwd(res, g):
    a, b = res
    # dA = g @ Bᵀ ; dB = Aᵀ @ g — reference src/ops.rs:238-294.
    da = _linear_pallas_raw(g, b, None, epilogue="none", has_bias=False)
    db = _linear_pallas_raw(a.T, g.T, None, epilogue="none", has_bias=False)
    return da, db


matmul.defvjp(_matmul_fwd, _matmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear(x, w, b, activation: str = "none"):
    """Fused ``x @ wᵀ + b`` with optional 'relu'/'sigmoid' epilogue.

    ``w`` is ``[out, in]`` (reference ``Linear`` layout, ``src/nn.rs:34``).
    """
    return _linear_pallas_raw(x, w, b, epilogue=activation, has_bias=True)


def _linear_fwd(x, w, b, activation):
    y = linear(x, w, b, activation)
    return y, (x, w, y)


def _linear_bwd(activation, res, g):
    x, w, y = res
    if activation == "relu":
        g = jnp.where(y > 0, g, 0.0)
    elif activation == "sigmoid":
        g = g * y * (1.0 - y)
    # dX = g @ W ([M,N] @ [N,K]); dW = gᵀ @ X ([N,M] @ [M,K]); db = Σ_M g.
    dx = _linear_pallas_raw(g, w.T, None, epilogue="none", has_bias=False)
    dw = _linear_pallas_raw(g.T, x.T, None, epilogue="none", has_bias=False)
    db = jnp.sum(g, axis=0)
    return dx, dw, db


linear.defvjp(_linear_fwd, _linear_bwd)
