"""Dequant-on-load quantized matmul (Pallas, MXU): int8 and packed int4.

The BASELINE.json north-star item: quantized weights stay packed in HBM;
each weight tile is dequantized **inside the kernel** on its way through
VMEM, so the f32 weights never exist in HBM (the reference instead
dequantizes whole tensors up front and caches them — ``nn.rs:89-122`` —
getting memory savings only at rest).

Math trick: with affine weights ``w = (q − zp)·scale`` (per-tensor or
per-output-channel), the layer output factorizes as

    y[m,n] = scale[n]·( Σ_k x[m,k]·q[n,k] )  −  scale[n]·zp[n]·( Σ_k x[m,k] )

so the MXU runs on the raw integer codes (cast to bf16 — exact for int8's
range) and the affine correction is a cheap VPU epilogue using the
per-tile row-sum of ``x``.  Symmetric weights (zp = 0) skip the correction.

int4 layout trick: a packed tile unpacks to nibble columns in
(evens, odds) order — re-interleaving them on the lane dim would cost a
VPU relayout per tile, so instead the ACTIVATION's columns are permuted
once at the XLA level to the same order (contraction order is free), and
the kernel contracts the planar-unpacked tile directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend
from taper_tpu.ops.pallas.gemm import _pad2, _pick_block, _round_up

# Tuning hook for benchmarks/sweep_gemm.py.
_BLOCK_OVERRIDE = {"blocks": None}


def _q8_kernel(x_ref, q_ref, scale_ref, zp_ref, b_ref, o_ref,
               xsum_ref, *, n_k, epilogue, has_bias):
    # Accumulate in the k-revisited output block (VMEM-resident across the
    # K loop); a scratch accumulator would only shrink the affordable tile.
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)

    x = x_ref[:]
    q = q_ref[:].astype(jnp.bfloat16)       # int8 codes: exact in bf16
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xsum_ref[:] += jnp.sum(x, axis=1, keepdims=True)   # [bm, 1]

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        scale = scale_ref[:]                 # [1, bn]
        zp = zp_ref[:]                       # [1, bn]
        out = o_ref[:] * scale - xsum_ref[:] * (scale * zp)
        if has_bias:
            out = out + b_ref[:]
        if epilogue == "relu":
            out = jnp.maximum(out, 0.0)
        elif epilogue == "sigmoid":
            out = jax.nn.sigmoid(out)
        o_ref[:] = out.astype(o_ref.dtype)


def linear_q8(x, q, scale, zp, b, *, epilogue: str = "none",
              has_bias: bool = True):
    """``y = x @ dequant(q)ᵀ (+ b)`` with q int8 ``[N, K]``, scale/zp
    per-tensor scalars or per-channel ``[N]`` vectors."""
    return _linear_q8_jit(x, q, scale, zp, b, epilogue=epilogue,
                          has_bias=has_bias,
                          blocks=_BLOCK_OVERRIDE["blocks"])


@functools.partial(jax.jit,
                   static_argnames=("epilogue", "has_bias", "blocks"))
def _linear_q8_jit(x, q, scale, zp, b, *, epilogue: str = "none",
                   has_bias: bool = True, blocks=None):
    M, K = x.shape
    N, K2 = q.shape
    assert K == K2, (x.shape, q.shape)

    if blocks is not None:
        pm, pn, pk = blocks
    else:
        # Swept on v5e (benchmarks/sweep_gemm.py serve): skinny-batch
        # serving wants the widest N tile the output block affords, so the
        # int8 weights stream through HBM exactly once — (128, 8192, 256)
        # reaches 286 TFLOP/s-equivalent (60us) vs 251 for XLA's fused
        # dequant.  Budget ~6MB of VMEM for the f32 output/accumulator.
        pm = 1024 if M >= 1024 else _round_up(M, 8)
        pn = min(8192, max(1024, (6 * 2 ** 20) // (4 * pm) // 128 * 128))
        pk = 256
    bm = _pick_block(M, pm, 8)
    bn = _pick_block(N, pn, 128)
    bk = _pick_block(K, pk, 128)
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)

    xp = _pad2(x, Mp, Kp)
    qp = _pad2(q, Np, Kp)
    scale_row = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(-1), (N,))
    zp_row = jnp.broadcast_to(
        jnp.asarray(zp, jnp.float32).reshape(-1), (N,))
    scale_p = jnp.pad(scale_row, (0, Np - N)).reshape(1, Np)
    zp_p = jnp.pad(zp_row, (0, Np - N)).reshape(1, Np)
    n_k = Kp // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    args = [xp, qp, scale_p, zp_p]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        args.append(jnp.pad(b, (0, Np - N)).reshape(1, Np))
        kernel = functools.partial(_q8_kernel, n_k=n_k, epilogue=epilogue,
                                   has_bias=True)
    else:
        def kernel(x_ref, q_ref, s_ref, z_ref, o_ref, xs_ref):
            _q8_kernel(x_ref, q_ref, s_ref, z_ref, None, o_ref,
                       xs_ref, n_k=n_k, epilogue=epilogue, has_bias=False)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=4 * Mp * Kp + Np * Kp + 4 * Mp * Np,
            transcendentals=0,
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out


# ---------------------------------------------------------------------------
# int4 (packed nibbles) dequant-on-load linear
# ---------------------------------------------------------------------------

def _q4_kernel(x_ref, q_ref, scale_ref, zp_ref, b_ref, o_ref,
               xsum_ref, *, n_k, epilogue, has_bias):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)

    x = x_ref[:]                            # columns pre-permuted (see top)
    # int32 arithmetic shifts sign-extend both nibbles without selects
    # (Mosaic has no i8 vector shifts): byte b -> lo=(b<<28)>>28,
    # hi=(b<<24)>>28 in two's complement.
    q = q_ref[:].astype(jnp.int32)          # [bn, bk//2] packed bytes
    lo = ((q << 28) >> 28).astype(jnp.bfloat16)
    hi = ((q << 24) >> 28).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=1)   # [bn, bk] planar
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xsum_ref[:] += jnp.sum(x, axis=1, keepdims=True)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        scale = scale_ref[:]
        zp = zp_ref[:]
        out = o_ref[:] * scale - xsum_ref[:] * (scale * zp)
        if has_bias:
            out = out + b_ref[:]
        if epilogue == "relu":
            out = jnp.maximum(out, 0.0)
        elif epilogue == "sigmoid":
            out = jax.nn.sigmoid(out)
        o_ref[:] = out.astype(o_ref.dtype)


def linear_q4(x, packed, scale, zp, b, *, n_features: int,
              epilogue: str = "none", has_bias: bool = True):
    """``y = x @ dequant(int4 packed)ᵀ (+ b)``.

    ``packed``: flat uint8 nibbles from ``qtensor._pack_nibbles`` over a
    row-major ``[N, K]`` weight (K must be even so rows stay byte-aligned);
    ``n_features = K``.  Weight HBM traffic is K/2 bytes per row — half of
    int8, an eighth of f32.
    """
    return _linear_q4_jit(x, packed, scale, zp, b, n_features=n_features,
                          epilogue=epilogue, has_bias=has_bias,
                          blocks=_BLOCK_OVERRIDE["blocks"])


@functools.partial(jax.jit,
                   static_argnames=("n_features", "epilogue", "has_bias",
                                    "blocks"))
def _linear_q4_jit(x, packed, scale, zp, b, *, n_features, epilogue,
                   has_bias, blocks=None):
    import numpy as np

    M, K = x.shape
    assert K == n_features and K % 2 == 0, (x.shape, n_features)
    N = packed.size * 2 // K
    q2 = packed.reshape(N, K // 2)

    if blocks is not None:
        pm, pn, pk = blocks
    else:
        pm = 1024 if M >= 1024 else _round_up(M, 8)
        pn = min(8192, max(1024, (6 * 2 ** 20) // (4 * pm) // 128 * 128))
        pk = 512
    bm = _pick_block(M, pm, 8)
    bn = _pick_block(N, pn, 128)
    bk = min(_round_up(K, 256), _round_up(pk, 256))  # bk//2 lane-aligned
    Mp, Np, Kp = _round_up(M, bm), _round_up(N, bn), _round_up(K, bk)

    # Permute x's columns to the kernel's planar nibble order: within each
    # bk-wide K block, even original columns first, then odd.
    n_blocks = Kp // bk
    base = np.arange(n_blocks)[:, None] * bk
    inner = np.concatenate([np.arange(0, bk, 2), np.arange(1, bk, 2)])
    perm = (base + inner[None, :]).reshape(-1)
    xp = _pad2(x, Mp, Kp)[:, perm]

    qp = _pad2(q2, Np, Kp // 2)
    scale_row = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(-1), (N,))
    zp_row = jnp.broadcast_to(
        jnp.asarray(zp, jnp.float32).reshape(-1), (N,))
    scale_p = jnp.pad(scale_row, (0, Np - N)).reshape(1, Np)
    zp_p = jnp.pad(zp_row, (0, Np - N)).reshape(1, Np)
    n_k = Kp // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bn, bk // 2), lambda i, j, k: (j, k)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    args = [xp, qp, scale_p, zp_p]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k: (0, j)))
        args.append(jnp.pad(b, (0, Np - N)).reshape(1, Np))
        kernel = functools.partial(_q4_kernel, n_k=n_k, epilogue=epilogue,
                                   has_bias=True)
    else:
        def kernel(x_ref, q_ref, s_ref, z_ref, o_ref, xs_ref):
            _q4_kernel(x_ref, q_ref, s_ref, z_ref, None, o_ref,
                       xs_ref, n_k=n_k, epilogue=epilogue, has_bias=False)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=4 * Mp * Kp + Np * Kp // 2 + 4 * Mp * Np,
            transcendentals=0,
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out


# ---------------------------------------------------------------------------
# W8A8: true int8×int8 MXU matmul (dynamic per-row activation quant)
# ---------------------------------------------------------------------------

def _i8mm_kernel(x_ref, q_ref, o_ref, acc_ref, *, n_k):
    """Plain int8·int8 → int32 accumulation.  Unlike the dequant-on-load
    family above (int8 codes cast to bf16, ~bf16 MXU rate), this drives
    the MXU's NATIVE int8 path — raw-kernel probe 285 TOP/s vs bf16's
    157 on v5e; end-to-end linear race at M4096 N=K=8192 (same-process,
    full-output reduction): **W8A8 211 TOP/s vs W8A16 dequant-on-load
    128 (1.64×) vs bf16 dense 185 (1.14×)** with 1.0% max relative
    error (activation rounding over the K=8192 contraction).  All
    scaling/zero-point/bias algebra happens OUTSIDE at the XLA level
    (cheap elementwise, fused into the consumer).

    Model-level honesty (measured): a dim-2048 TinyGPT PTQ prefill is
    a WASH (32.6 vs 33.3 ms for a 4×1024 forward) — at K=2048 the
    dynamic activation-quant passes (two extra sweeps over x per
    linear) cancel the MXU gain; the win needs large contractions
    (K ≳ 4-8K, i.e. genuinely large models).  Hence opt-in
    (TAPER_W8A8=1), not a default.  r5: linear_w8a8 no longer uses
    this split form — matmul_int8_scaled fuses the affine epilogue
    into the kernel so the int32 [M, N] accumulator never round-trips
    HBM; this plain variant stays as the exact-integer primitive (and
    its unit-test oracle)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _i8mm_scaled_kernel(x_ref, q_ref, sx_ref, corr_ref, sw_ref, zw_ref,
                        *rest, n_k, relu, has_bias):
    """int8·int8 → int32 with the W8A8 affine algebra fused into the
    final k-step:  y = s_x ⊙ s_w ⊙ (acc − zp_w·Σxq) (+ bias) (+ relu),
    emitted in the OUTPUT dtype directly.

    The split formulation (matmul_int8 then XLA scaling) round-trips
    the int32 [M, N] accumulator through HBM and reads it back for the
    scale pass — at the dim-2048 prefill shape that is ~200 MB of extra
    traffic per MLP linear, which measured as W8A8 LOSING to bf16 dense
    (benchmarks/bench_w8a8_prefill.py r5: 26.4 vs 40.3 ms).  Here acc
    never leaves VMEM."""
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        y = sx_ref[:] * sw_ref[:] * (acc - zw_ref[:] * corr_ref[:])
        if has_bias:
            y = y + b_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y.astype(o_ref.dtype)


def matmul_int8_scaled(xq, q, sx, corr, sw, zw, bias=None, relu=False,
                       out_dtype=jnp.float32):
    """Fused W8A8 linear core: ``xq [M,K] i8 @ q [N,K] i8ᵀ`` with the
    per-row activation scale ``sx [M]``, codes-sum ``corr [M]``, weight
    scale ``sw [N]`` and zero point ``zw [N]`` applied in the kernel's
    epilogue (plus optional bias/ReLU) — output ``[M, N] out_dtype``,
    int32 accumulator VMEM-resident throughout."""
    m, k = xq.shape
    n, k2 = q.shape
    assert k == k2, (xq.shape, q.shape)
    bm = min(512, _round_up(m, 128))
    bn = min(1024, _round_up(n, 128))
    bk = min(512, _round_up(k, 128))
    mp, np_, kp = (_round_up(m, bm), _round_up(n, bn), _round_up(k, bk))
    xp = _pad2(xq, mp, kp)
    qp = _pad2(q, np_, kp)
    # row vectors ride as (mp, 1) / (1, np) blocks (tiny; the lane/
    # sublane padding is noise next to the deleted acc round-trip)
    sx2 = _pad2(sx.astype(jnp.float32).reshape(m, 1), mp, 1)
    cr2 = _pad2(corr.astype(jnp.float32).reshape(m, 1), mp, 1)
    sw2 = _pad2(sw.astype(jnp.float32).reshape(1, n), 1, np_)
    zw2 = _pad2(zw.astype(jnp.float32).reshape(1, n), 1, np_)
    n_k = kp // bk
    in_specs = [pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk)),
                pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
                pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j))]
    args = [xp, qp, sx2, cr2, sw2, zw2]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)))
        args.append(_pad2(jnp.asarray(bias, jnp.float32)
                          .reshape(1, n), 1, np_))
    out = pl.pallas_call(
        functools.partial(_i8mm_scaled_kernel, n_k=n_k, relu=relu,
                          has_bias=bias is not None),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + np_ * kp
            + jnp.dtype(out_dtype).itemsize * mp * np_,
            transcendentals=0),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    return out[:m, :n] if (mp, np_) != (m, n) else out


def matmul_int8(xq, q):
    """``xq [M, K] int8 @ q [N, K] int8 ᵀ -> int32 [M, N]`` (exact
    integer arithmetic; zero-padded to tile multiples)."""
    assert xq.dtype == jnp.int8 and q.dtype == jnp.int8
    m, k = xq.shape
    n, k2 = q.shape
    assert k == k2, (xq.shape, q.shape)
    bm = min(512, _round_up(m, 128))
    bn = min(1024, _round_up(n, 128))
    bk = min(512, _round_up(k, 128))
    mp, np_, kp = (_round_up(m, bm), _round_up(n, bn), _round_up(k, bk))
    xp = _pad2(xq, mp, kp)
    qp = _pad2(q, np_, kp)
    n_k = kp // bk
    out = pl.pallas_call(
        functools.partial(_i8mm_kernel, n_k=n_k),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                  pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + np_ * kp + 4 * mp * np_,
            transcendentals=0),
        interpret=_backend.pallas_interpret_mode(),
    )(xp, qp)
    return out[:m, :n] if (mp, np_) != (m, n) else out


def _rowquant_block(m: int, k: int, itemsize: int):
    """Row-block size for :func:`quantize_rows`, or ``None`` if no
    Mosaic-legal block fits VMEM.  Legal means the scale outputs'
    ``(8, bm)`` block satisfies the lane rule — ``bm == m`` (blocks
    equal their arrays, one grid step) or ``bm`` a 128-multiple divisor
    of ``m`` — under a ~6 MB per-buffer budget (Mosaic double-buffers:
    input block ``bm*k*itemsize`` + int8 out ``bm*k``)."""
    cap = (6 * 1024 * 1024) // max(k * (itemsize + 1), 1)
    if m <= cap:
        return m
    return next((c for c in (512, 384, 256, 128)
                 if c <= cap and m % c == 0), None)


def _rowquant_kernel(x_ref, xq_ref, sx_ref, xs_ref):
    x = x_ref[:].astype(jnp.float32)
    a = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(a, 1e-8) / 127.0
    qc = jnp.round(x / s)
    xq_ref[:] = qc.astype(jnp.int8)
    # scale/codes-sum exported on the (8, bm) lse-style layout (lane
    # dim = rows): a [bm, 1] column output would pad to 128 lanes
    sx_ref[:] = jnp.broadcast_to(s[:, 0][None, :], sx_ref.shape)
    xs_ref[:] = jnp.broadcast_to(jnp.sum(qc, axis=1)[None, :],
                                 xs_ref.shape)


def quantize_rows(x):
    """One-pass dynamic per-row activation quantization:
    ``x [M, K] -> (xq int8 [M, K], sx f32 [M], xsum f32 [M])`` with
    ``sx = absmax/127`` (symmetric) and ``xsum = Σ_k xq`` (the
    zero-point correction term of :func:`linear_w8a8`).

    At the XLA level the same computation is an absmax reduce pass plus
    a round pass plus a codes-sum pass — ≥3 HBM sweeps of ``x``; here
    the row block stays VMEM-resident for all three (1 read + ¼ write).

    Block-geometry constraint (Mosaic): the scale outputs live on an
    ``(8, M)`` lane-major layout with block ``(8, bm)``, whose lane dim
    must be a multiple of 128 OR the whole array — so ``bm`` is either
    ``m`` itself (single grid step) or a 128-multiple divisor of ``m``
    under the VMEM cap.  Shapes with neither (large ragged M at large
    K) fall back to the XLA 3-sweep form HERE, so every caller gets the
    correct result at every shape."""
    m, k = x.shape
    bm = _rowquant_block(m, k, x.dtype.itemsize)
    if bm is None:
        # XLA fallback (3 sweeps) — correctness at any shape
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        xq = jnp.round(xf / sx[:, None]).astype(jnp.int8)
        xsum = jnp.sum(xq.astype(jnp.int32), axis=-1).astype(
            jnp.float32)
        return xq, sx, xsum
    xq, sx, xs = pl.pallas_call(
        _rowquant_kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                   pl.BlockSpec((8, bm), lambda i: (0, i)),
                   pl.BlockSpec((8, bm), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((m, k), jnp.int8),
                   jax.ShapeDtypeStruct((8, m), jnp.float32),
                   jax.ShapeDtypeStruct((8, m), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k,
            bytes_accessed=x.dtype.itemsize * m * k + m * k + 8 * m,
            transcendentals=0),
        interpret=_backend.pallas_interpret_mode(),
    )(x)
    return xq, sx[0], xs[0]


def linear_w8a8(x, q, scale, zp, b=None, *, epilogue="none"):
    """W8A8 linear: activations dynamically quantized PER ROW
    (symmetric absmax/127), weights the PTQ int8 codes — the whole
    contraction runs on the MXU's native int8 path (~1.8× the bf16
    rate), with the affine algebra recovered exactly at the XLA level:

        ŵ = (q − zp_w)·s_w ;  x̂ = s_x ⊙ xq
        y[m,n] = s_x[m]·s_w[n]·(acc[m,n] − zp_w[n]·Σ_k xq[m,k]) + bias

    The only approximation is the activation rounding (≤ 0.4% relative
    per element); weights are bit-identical to the dequant-on-load
    path.  Use for COMPUTE-bound shapes (prefill, training batches) —
    the decode matvec stays bandwidth-bound and keeps dequant-on-load.
    """
    # one-pass Pallas row quant (absmax + round + codes-sum in a
    # single HBM read; quantize_rows itself falls back to the ~3-sweep
    # XLA form at block-infeasible shapes)
    xq, sx, corr = quantize_rows(x)
    sw = jnp.broadcast_to(jnp.asarray(scale, jnp.float32).reshape(-1),
                          (q.shape[0],))
    zw = jnp.broadcast_to(jnp.asarray(zp, jnp.float32).reshape(-1),
                          (q.shape[0],))
    # bf16 activations emit bf16 (halves the output write; matches the
    # trunk dtype); f32 callers keep f32
    out_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    y = matmul_int8_scaled(xq, q, sx, corr, sw, zw, bias=b,
                           relu=epilogue == "relu", out_dtype=out_dtype)
    if epilogue == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y
