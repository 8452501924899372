"""Pallas MXU matmul + fused linear kernels.

TPU-native replacement for the reference's GEMM backend
(``src/gemm.rs:8-129``: CBLAS / matrixmultiply behind a feature flag) and the
``Linear`` forward (``src/nn.rs:54-59``: transpose + matmul + add_broadcast as
three tape ops).  Here the whole layer — ``x @ W.T + b`` with an optional ReLU
epilogue — is ONE tiled Pallas kernel: the MXU does the contraction, and the
bias add + activation run on the VPU while the tile is still in VMEM (the
fusion the reference approximates with ``conv2d_relu``-style hand fusion).

Transposes never materialize: the kernel supports all three contraction
modes the training step needs (the reference's ``sgemm_rowmajor(transA,
transB, …)`` flags, ``gemm.rs:8``):

* ``"nt"`` — ``y = a @ bᵀ``  (forward: ``x[M,K] · w[N,K]``)
* ``"nn"`` — ``y = a @ b``    (backward dx: ``g[M,N] · w[N,K]``)
* ``"tn"`` — ``y = aᵀ @ b``  (backward dw: ``g[M,N]ᵀ… as x[M,K]ᵀ·g``)

so the backward pass (dX = g·W, dW = gᵀ·X, db = Σg — the hand formulas in
reference ``src/ops.rs:238-294``) reads every operand in its natural layout.

Compute dtype: ``set_compute_dtype('bfloat16')`` casts MXU inputs to bf16
(the MXU's native format — single-pass instead of f32's multi-pass) while
accumulating in f32.  Default is f32 for strict reference parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend

_compute = {"dtype": "float32"}

# Tuning hook for benchmarks/sweep_gemm.py: when set, overrides the
# (bm, bn, bk) block choice below.
_BLOCK_OVERRIDE = {"blocks": None}


def set_compute_dtype(name: str) -> None:
    """MXU input dtype for Pallas GEMMs: 'float32' or 'bfloat16'."""
    assert name in ("float32", "bfloat16"), name
    _compute["dtype"] = name


def get_compute_dtype() -> str:
    return _compute["dtype"]


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


# Contraction-mode table: for out[M, N] = contract_K(a, b),
#   a_mk: True if a is laid out [M, K] (else [K, M])
#   b_nk: True if b is laid out [N, K] (else [K, N])
_MODES = {
    "nt": (True, True),
    "nn": (True, False),
    "tn": (False, False),
}


def _linear_kernel(x_ref, w_ref, b_ref, o_ref, *, n_k, epilogue,
                   dims, cdtype):
    # Accumulate directly in the (f32, k-revisited) output block: Pallas
    # keeps it VMEM-resident across the whole K loop, so a separate scratch
    # accumulator would only burn bm*bn*4 bytes of VMEM that larger tiles
    # need (larger tiles = less HBM operand refetch, the actual limiter).
    # (A write-first variant materializes the dot product as a bm*bn*4
    # temporary and blows VMEM at the largest tiles; the zero-init +=
    # form lets Mosaic fuse the accumulate and measures the same.)
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = x_ref[:]
    b = w_ref[:]
    if cdtype == "bfloat16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    o_ref[:] += jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        acc = o_ref[:]
        if b_ref is not None:
            acc = acc + b_ref[:]
        if epilogue == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif epilogue == "sigmoid":
            acc = jax.nn.sigmoid(acc)
        o_ref[:] = acc.astype(o_ref.dtype)


def _gemm(a, b, bias, *, epilogue: str = "none", has_bias: bool = True,
          mode: str = "nt", cdtype: str = ""):
    """out[M, N] = contract_K(a, b) (+ bias[N]) (+ activation)."""
    # Resolve the compute dtype and block override OUTSIDE the jitted body
    # so switching them retraces (they are part of the jit cache key).
    return _gemm_jit(a, b, bias, epilogue=epilogue, has_bias=has_bias,
                     mode=mode, cdtype=cdtype or _compute["dtype"],
                     blocks=_BLOCK_OVERRIDE["blocks"])


@functools.partial(jax.jit,
                   static_argnames=("epilogue", "has_bias", "mode", "cdtype",
                                    "blocks"))
def _gemm_jit(a, b, bias, *, epilogue, has_bias, mode, cdtype, blocks=None):
    a_mk, b_nk = _MODES[mode]
    M, K = a.shape if a_mk else a.shape[::-1]
    N, K2 = b.shape if b_nk else b.shape[::-1]
    assert K == K2, (a.shape, b.shape, mode)

    # Block sizes swept on v5e at 4096³ (see benchmarks/kernels.py history):
    # (512, 1024, 512) reaches 233 TFLOP/s bf16 / 117 TFLOP/s f32 vs
    # 22 TFLOP/s at the naive (128, 128, 512) — large bm·bn amortizes
    # operand refetch across the K loop and keeps the MXU pipeline full.
    # Swept on v5e at 4096³ (benchmarks/{sweep_gemm,tune_all}.py): with the
    # output block doubling as the accumulator, (1024, 1024, 512) measures
    # 153-160 TFLOP/s on f32 inputs across interleaved races (device drifts
    # ±15% between runs; XLA's emitter measures 154-162 on the same shape).
    # The in-kernel bf16 cast adds operand-sized temporaries, so that
    # compute dtype takes the next tile down to stay inside VMEM.
    if blocks is not None:
        pm, pn, pk = blocks
    elif cdtype == "bfloat16":
        pm, pn, pk = 1024, 1024, 256
    else:
        pm, pn, pk = 1024, 1024, 512
    bm = _pick_block(M, pm, 8)
    bn = _pick_block(N, pn, 128)
    bk = _pick_block(K, pk, 128)
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)
    n_k = Kp // bk

    if a_mk:
        ap = _pad2(a, Mp, Kp)
        a_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k))
        a_dim = 1
    else:
        ap = _pad2(a, Kp, Mp)
        a_spec = pl.BlockSpec((bk, bm), lambda i, j, k: (k, i))
        a_dim = 0
    if b_nk:
        bp = _pad2(b, Np, Kp)
        b_spec = pl.BlockSpec((bn, bk), lambda i, j, k: (j, k))
        b_dim = 1
    else:
        bp = _pad2(b, Kp, Np)
        b_spec = pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))
        b_dim = 0
    dims = ((a_dim,), (b_dim,))

    in_specs = [a_spec, b_spec]
    args = [ap, bp]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        args.append(jnp.pad(bias, (0, Np - N)).reshape(1, Np))
        kernel = functools.partial(_linear_kernel, n_k=n_k,
                                   epilogue=epilogue, dims=dims,
                                   cdtype=cdtype)
    else:
        def kernel(x_ref, w_ref, o_ref):
            _linear_kernel(x_ref, w_ref, None, o_ref, n_k=n_k,
                           epilogue=epilogue, dims=dims, cdtype=cdtype)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
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


# Back-compat name used by quant.py
def _linear_pallas_raw(x, w, b, *, epilogue="none", has_bias=True):
    return _gemm(x, w, b, epilogue=epilogue, has_bias=has_bias, mode="nt")


# ---------------------------------------------------------------------------
# Public differentiable ops
# ---------------------------------------------------------------------------

@jax.custom_vjp
def matmul(a, b):
    """2-D ``a[M,K] @ b[K,N]`` on the MXU (Pallas backend)."""
    return _gemm(a, b, None, has_bias=False, mode="nn")


def _matmul_fwd(a, b):
    return matmul(a, b), (a, b)


def _matmul_bwd(res, g):
    a, b = res
    # dA = g · Bᵀ ; dB = Aᵀ · g — reference src/ops.rs:238-294.
    da = _gemm(g, b, None, has_bias=False, mode="nt")
    db = _gemm(a, g, None, has_bias=False, mode="tn")
    return da, db


matmul.defvjp(_matmul_fwd, _matmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear(x, w, b, activation: str = "none"):
    """Fused ``x @ wᵀ + b`` with optional 'relu'/'sigmoid' epilogue.

    ``w`` is ``[out, in]`` (reference ``Linear`` layout, ``src/nn.rs:34``).
    """
    return _gemm(x, w, b, epilogue=activation, has_bias=True, mode="nt")


def _linear_fwd(x, w, b, activation):
    y = linear(x, w, b, activation)
    return y, (x, w, b, y)


def _linear_bwd(activation, res, g):
    x, w, b, y = res
    if activation == "relu":
        g = jnp.where(y > 0, g, 0.0)
    elif activation == "sigmoid":
        g = g * y * (1.0 - y)
    # db sums the f32 cotangent BEFORE the operand-dtype cast and lands
    # at the bias's own dtype (an f32 bias keeps an f32 grad even under
    # a bf16 trunk).
    db = jnp.sum(g, axis=0).astype(b.dtype)
    # The output (and so its cotangent) is f32 even for bf16 operands;
    # run the grad GEMMs at the operand dtype and return grads with the
    # operand dtypes (custom_vjp requires dx.dtype == x.dtype).
    g = g.astype(x.dtype)
    # dX = g @ W ([M,N]·[N,K]); dW = gᵀ @ X ([M,N]ᵀ·[M,K]); db = Σ_M g.
    dx = _gemm(g, w, None, has_bias=False, mode="nn").astype(x.dtype)
    dw = _gemm(g, x, None, has_bias=False, mode="tn").astype(w.dtype)
    return dx, dw, db


linear.defvjp(_linear_fwd, _linear_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def linear_nb(x, w, activation: str = "none"):
    """Bias-free fused ``x @ wᵀ`` (+ activation) — conv GEMM helper."""
    return _gemm(x, w, None, epilogue=activation, has_bias=False, mode="nt")


def _linear_nb_fwd(x, w, activation):
    y = linear_nb(x, w, activation)
    return y, (x, w, y)


def _linear_nb_bwd(activation, res, g):
    x, w, y = res
    if activation == "relu":
        g = jnp.where(y > 0, g, 0.0)
    elif activation == "sigmoid":
        g = g * y * (1.0 - y)
    g = g.astype(x.dtype)
    dx = _gemm(g, w, None, has_bias=False, mode="nn").astype(x.dtype)
    dw = _gemm(g, x, None, has_bias=False, mode="tn").astype(w.dtype)
    return dx, dw


linear_nb.defvjp(_linear_nb_fwd, _linear_nb_bwd)
