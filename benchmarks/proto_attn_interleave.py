"""Prototype: chunked-interleave flash-attention FORWARD.

Hypothesis (round-4 verdict item 1): the production forward serializes
MXU and VPU — measured S=4096 bf16 causal time (~1.6 ms) is almost
exactly the sum of the D=64 MXU floor (~1.06 ms) and the softmax VPU
cost (~0.52 ms).  Splitting every KV tile into ``nchunk`` column chunks
with an online-softmax update between them creates INDEPENDENT
dot→exp→dot chains that Mosaic's instruction scheduler can overlap
(chunk c+1's QK dot runs on the MXU while chunk c's exp2 runs on the
VPU).  Bonus: on the diagonal tile the fully-masked chunks are skipped,
cutting the causal overcompute from 1.5× to ~1.25× at (1024, 2048).

The earlier TAPER_ATTN_CHUNK experiment (negative, see attention.py)
chunked ONLY the diagonal tile — bulk tiles stayed single-dot, so no
overlap was created where the time actually goes.

Run:  python benchmarks/proto_attn_interleave.py
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
    _LN2, _NEG_INF, _dot_in, _mask, _q_scaled, _tri_counts_fwd,
    _tri_unrank)

_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_kernel_chunked(off_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                        m_sc, l_sc, acc_sc, *, scale, causal, bq, bk,
                        nchunk, tri, lowp):
    r = bk // bq
    iq, ik = _tri_unrank(pl.program_id(2), tri)
    first = ik == 0
    last = ik == iq // r
    off = off_ref[0].astype(jnp.int32)
    koff = off_ref[1].astype(jnp.int32)
    chunk = bk // nchunk

    @pl.when(first)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = _q_scaled(q_ref, scale, lowp)

    def do_chunk(c, masked):
        sl = slice(c * chunk, (c + 1) * chunk)
        s = jax.lax.dot_general(
            q, _dot_in(k_ref[0, sl, :], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            s = _mask(s, iq, ik, bq, bk, off, koff + c * chunk,
                      causal, None)
        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp2(s - m_safe)
        corr = jnp.exp2(m_prev - m_safe)
        l_sc[:] = jnp.broadcast_to(
            l_sc[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True),
            l_sc.shape)
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        v = _dot_in(v_ref[0, sl, :], lowp)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_sc[:] = acc_sc[:] * corr + pv

    @pl.when(jnp.logical_not(last))
    def _bulk():
        for c in range(nchunk):
            do_chunk(c, False)

    @pl.when(last)
    def _diag():
        row_max = off + iq * bq + bq - 1
        for c in range(nchunk):
            @pl.when(koff + ik * bk + c * chunk <= row_max)
            def _(c=c):
                do_chunk(c, True)

    @pl.when(last)
    def _fin():
        l = l_sc[:, :1]
        safe = jnp.maximum(l, 1e-30)
        o_ref[0] = jnp.where(l > 0, acc_sc[:] / safe,
                             0.0).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            jnp.where(l > 0, m_sc[:, :1] * _LN2 + jnp.log(safe),
                      _NEG_INF)[:, 0][None, :], lse_ref.shape[1:])


def flash_fwd_chunked(q, k, v, scale=None, bq=1024, bk=2048, nchunk=2):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    nq, nk = sq // bq, sk // bk
    bh = b * h
    q3 = q.reshape(bh, sq, d)
    k3 = k.reshape(bh, sk, d)
    v3 = v.reshape(bh, sk, d)
    off = jnp.zeros((2,), jnp.float32)
    tri = _tri_counts_fwd(nq, bk // bq)
    steps = sum(tri)
    q_idx = lambda g, i, t: (g, _tri_unrank(t, tri)[0], 0)
    kv_idx = lambda g, i, t: (g, _tri_unrank(t, tri)[1], 0)
    lse_idx = lambda g, i, t: (g, 0, _tri_unrank(t, tri)[0])
    o3, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_chunked, scale=scale, causal=True,
                          bq=bq, bk=bk, nchunk=nchunk, tri=tri,
                          lowp=True),
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
                        pltpu.VMEM((bq, 128), jnp.float32),
                        pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d // 2,
            bytes_accessed=q.dtype.itemsize * (bh * 2 * sq + bh * 2 * sk) * d,
            transcendentals=bh * sq * sk),
    )(off, q3, k3, v3)
    return o3.reshape(b, h, sq, d)


def main():
    from taper_tpu.ops import xla as X
    from taper_tpu.ops.pallas.attention import flash_attention as prod

    b, h, s, d = 4, 8, 4096, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
               for kk in ks)
    f4 = 4 * b * h * s * s * d / 2

    # correctness first
    want = X.attention(q, k, v, causal=True)
    for nc, cbq, cbk in [(2, 1024, 2048), (4, 1024, 2048),
                         (2, 512, 1024)]:
        got = jax.jit(functools.partial(flash_fwd_chunked, bq=cbq,
                                        bk=cbk, nchunk=nc))(q, k, v)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        print(f"nchunk={nc} bq={cbq} bk={cbk} max_err={err:.5f}")
        assert err < 2e-2, err

    def wrap(attn):
        return lambda qc, kc, vc: qc + 0.001 * attn(qc, kc, vc)

    cs = [Contender("prod (tri, unchunked)",
                    wrap(lambda q_, k_, v_: prod(q_, k_, v_, True)),
                    q, (k, v), n_hi=60, n_lo=10)]
    for nc, cbq, cbk in [(2, 1024, 2048), (4, 1024, 2048),
                         (2, 1024, 1024), (2, 512, 2048),
                         (4, 512, 2048)]:
        cs.append(Contender(
            f"chunked nc={nc} {cbq}x{cbk}",
            wrap(functools.partial(flash_fwd_chunked, bq=cbq, bk=cbk,
                                   nchunk=nc)),
            q, (k, v), n_hi=60, n_lo=10))
    race(cs, scale=f4 / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
