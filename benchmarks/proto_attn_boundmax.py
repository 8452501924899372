"""Prototype: bound-max flash-attention FORWARD (VPU diet).

The production forward's time ≈ MXU floor + a serialized VPU softmax
(~5 passes per score element: sub, exp2, max-reduce, sum-reduce, bf16
cast).  Two structural cuts:

1. **ones-padded V**: at D=64 the PV dot uses 64 of the MXU's 128
   output lanes — padding V to 128 columns with a ones column makes the
   row-sum ``l = Σp`` fall out of the SAME MXU pass, deleting the VPU
   sum-reduce entirely.

2. **bound max**: softmax is shift-invariant — any upper bound b ≥
   max(s) gives the exact acc/l ratio (both scale by 2^(m−b), which
   cancels in the finalize divide).  Using the per-row bound
   ``b = ‖q̂_row‖₂ · max_tile‖k‖₂`` (Cauchy–Schwarz) instead of the
   running max deletes the per-element max-reduce AND all cross-tile
   corr bookkeeping (no m/l scratch updates, no acc rescale): the body
   collapses to dot → exp2(s−b) → cast → dot.

   Safety: p_max = 2^(max(s)−b) must stay ≥ f32 denormal range.  The
   overshoot b − max(s) is ≤ 2‖q̂‖‖k‖ (worst case anti-alignment), so
   the fast path is numerically safe whenever ‖q̂‖·max‖k‖ ≤ ~60 — for
   scale=1/√d and layernormed inputs it is ~1.5–15.  The production
   dispatch guards this with a lax.cond on the (cheap, O(S·D))
   precomputed bound product, falling back to the exact-max kernel.

Run:  python benchmarks/proto_attn_boundmax.py
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import Contender, race
from taper_tpu.ops.pallas.attention import (
    _LN2, _LOG2E, _NEG_INF, _dot_in, _mask, _q_scaled, _tri_counts_fwd,
    _tri_unrank)

_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_kernel_bound(kn_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                      b_sc, acc_sc, *, scale, bq, bk, tri, lowp,
                      nchunk=1):
    """Bound-max forward: no running max, no corr, l via ones-padded V.

    With no cross-chunk softmax state, ``nchunk`` column chunks are
    fully independent dot→exp2→dot chains (acc += is order-free) —
    interleaving fodder for the Mosaic scheduler, plus masked-chunk
    skip on the diagonal tile."""
    r = bk // bq
    iq, ik = _tri_unrank(pl.program_id(2), tri)
    first = ik == 0
    last = ik == iq // r
    d = q_ref.shape[-1]
    chunk = bk // nchunk

    q = _q_scaled(q_ref, scale, lowp)

    @pl.when(first)
    def _init():
        # per-row bound b = ||q̂_row|| * max||k|| (base-2 logits since
        # q̂ carries log2(e)); computed once per q block.
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1,
                              keepdims=True))
        b_sc[:] = jnp.broadcast_to(qn * kn_ref[pl.program_id(0)],
                                   b_sc.shape)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    def do_chunk(c, masked):
        sl = slice(c * chunk, (c + 1) * chunk)
        s = jax.lax.dot_general(
            q, _dot_in(k_ref[0, sl, :], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            s = _mask(s, iq, ik, bq, bk, 0, c * chunk, True, None)
        p = jnp.exp2(s - b_sc[:, :1])
        vp = jnp.pad(_dot_in(v_ref[0, sl, :], lowp).astype(jnp.float32),
                     ((0, 0), (0, 128 - d)),
                     constant_values=1.0)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16 if lowp else jnp.float32),
            vp.astype(jnp.bfloat16 if lowp else jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_sc[:] = acc_sc[:] + pv

    @pl.when(jnp.logical_not(last))
    def _bulk():
        for c in range(nchunk):
            do_chunk(c, False)

    @pl.when(last)
    def _diag():
        row_max = iq * bq + bq - 1
        for c in range(nchunk):
            if nchunk == 1:
                do_chunk(c, True)
            else:
                @pl.when(ik * bk + c * chunk <= row_max)
                def _(c=c):
                    do_chunk(c, True)

    @pl.when(last)
    def _fin():
        l = acc_sc[:, d:d + 1]
        safe = jnp.maximum(l, 1e-30)
        o_ref[0] = jnp.where(l > 0, acc_sc[:, :d] / safe,
                             0.0).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            jnp.where(l > 0, b_sc[:, :1] * _LN2 + jnp.log(safe),
                      _NEG_INF)[:, 0][None, :], lse_ref.shape[1:])


def flash_fwd_bound(q, k, v, scale=None, bq=1024, bk=2048, nchunk=1):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    nq = sq // bq
    bh = b * h
    q3 = q.reshape(bh, sq, d)
    k3 = k.reshape(bh, sk, d)
    v3 = v.reshape(bh, sk, d)
    # max ||k||2 per (b,h), in the kernel's base-2 logit units is folded
    # via q̂ (which already carries scale*log2e) — kn is plain ||k||.
    kn = jnp.max(jnp.sqrt(jnp.sum(k3.astype(jnp.float32) ** 2, -1)),
                 axis=-1)  # (bh,)
    tri = _tri_counts_fwd(nq, bk // bq)
    steps = sum(tri)
    q_idx = lambda g, i, t: (g, _tri_unrank(t, tri)[0], 0)
    kv_idx = lambda g, i, t: (g, _tri_unrank(t, tri)[1], 0)
    lse_idx = lambda g, i, t: (g, 0, _tri_unrank(t, tri)[0])
    o3, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bound, scale=scale, bq=bq, bk=bk,
                          tri=tri, lowp=True, nchunk=nchunk),
        grid=(bh, 1, steps),
        in_specs=[_SMEM_SPEC,
                  pl.BlockSpec((1, bq, d), q_idx),
                  pl.BlockSpec((1, bk, d), kv_idx),
                  pl.BlockSpec((1, bk, d), kv_idx)],
        out_specs=[pl.BlockSpec((1, bq, d), q_idx),
                   pl.BlockSpec((1, 8, bq), lse_idx)],
        out_shape=[jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d // 2,
            bytes_accessed=q.dtype.itemsize * (bh * 2 * sq + bh * 2 * sk) * d,
            transcendentals=bh * sq * sk),
    )(kn, q3, k3, v3)
    return o3.reshape(b, h, sq, d)


def main():
    from taper_tpu.ops import xla as X
    from taper_tpu.ops.pallas.attention import flash_attention as prod

    b, h, s, d = 4, 8, 4096, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
               for kk in ks)
    f4 = 4 * b * h * s * s * d / 2

    fb = jax.jit(flash_fwd_bound)
    want = X.attention(q, k, v, causal=True)
    got = fb(q, k, v)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"bound-max max_err={err:.5f} (unit-scale inputs)")
    assert err < 2e-2, err
    # stress the bound: 4x-scaled inputs (16x logit range)
    got4 = fb(4 * q, 4 * k, v)
    want4 = X.attention(4 * q, 4 * k, v, causal=True)
    err4 = float(jnp.max(jnp.abs(got4.astype(jnp.float32)
                                 - want4.astype(jnp.float32))))
    print(f"bound-max max_err={err4:.5f} (4x-scaled q,k)")

    def wrap(attn):
        return lambda qc, kc, vc: qc + 0.001 * attn(qc, kc, vc)

    cs = [Contender("prod (exact max)",
                    wrap(lambda q_, k_, v_: prod(q_, k_, v_, True)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 1024x2048",
                    wrap(flash_fwd_bound), q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 1024x1024",
                    wrap(functools.partial(flash_fwd_bound, bk=1024)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 512x2048",
                    wrap(functools.partial(flash_fwd_bound, bq=512)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 512x512",
                    wrap(functools.partial(flash_fwd_bound, bq=512,
                                           bk=512)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 1024x2048 nc=2",
                    wrap(functools.partial(flash_fwd_bound, nchunk=2)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 1024x2048 nc=4",
                    wrap(functools.partial(flash_fwd_bound, nchunk=4)),
                    q, (k, v), n_hi=60, n_lo=10),
          Contender("bound-max 1024x1024 nc=2",
                    wrap(functools.partial(flash_fwd_bound, bk=1024,
                                           nchunk=2)),
                    q, (k, v), n_hi=60, n_lo=10)]
    race(cs, scale=f4 / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
