"""Decompose the flash fwd kernel's time budget on the v5e.

Variants of a local copy of the fwd kernel, raced in one process:
  full      — the real kernel (online softmax, f32 exp)
  bf16exp   — exp computed in bf16 (VPU transcendental at half width?)
  noexp     — exp replaced by (s - m) (elementwise kept, no transcend.)
  nosoftmax — p = s (2 matmuls + masking only; MXU/pipeline roofline)
  noncausal — full kernel, causal=False (skipped-step overhead probe:
              2x the flops; if time < 2x causal, skipped steps are not
              free)

Run: python benchmarks/probe_attn_budget.py
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import Contender, race    # noqa: E402

NEG_INF = float("-inf")


def fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc, *,
               scale, causal, bq, bk, variant):
    iq, ik = pl.program_id(1), pl.program_id(2)
    nsteps = pl.num_programs(2)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    def body():
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            rows = iq * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = ik * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        if variant == "nosoftmax":
            p = jnp.where(jnp.isfinite(s), s, 0.0)
            l_sc[:] = l_sc[:] + 1.0
        else:
            m_prev = m_sc[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            if variant == "noexp":
                p = jnp.where(jnp.isfinite(s), s - m_safe, 0.0)
                corr = jnp.ones_like(m_safe)
            elif variant == "bf16exp":
                p = jnp.exp((s - m_safe).astype(jnp.bfloat16)) \
                    .astype(jnp.float32)
                corr = jnp.exp(m_prev - m_safe)
            else:
                p = jnp.exp(s - m_safe)
                corr = jnp.exp(m_prev - m_safe)
            l_sc[:] = jnp.broadcast_to(
                l_sc[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True),
                l_sc.shape)
            m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        v = v_ref[0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "nosoftmax":
            acc_sc[:] = acc_sc[:] + pv
        else:
            acc_sc[:] = acc_sc[:] * corr + pv

    if causal:
        pl.when(iq * bq + bq - 1 >= ik * bk)(body)
    else:
        body()

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _fin():
        l = l_sc[:, :1]
        safe = jnp.maximum(l, 1e-30)
        o_ref[0] = jnp.where(l > 0, acc_sc[:] / safe, 0.0) \
            .astype(o_ref.dtype)


def flash(q, k, v, causal, variant, bq=512, bk=2048):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    nq, nk = sq // bq, sk // bk
    bh = b * h
    q3, k3, v3 = (t.reshape(bh, -1, d) for t in (q, k, v))
    kv_idx = lambda g, i, j: (g, j, 0)
    return pl.pallas_call(
        functools.partial(fwd_kernel, scale=d ** -0.5, causal=causal,
                          bq=bq, bk=bk, variant=variant),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, d), kv_idx),
            pl.BlockSpec((1, bk, d), kv_idx),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q3, k3, v3).reshape(b, h, sq, d)


def main():
    b, h, s, d = 2, 8, 4096, 64
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
    flops = 4.0 * b * h * s * s * d / 2

    def mk(variant, causal=True):
        def step(qc):
            return qc + 0.001 * flash(qc, k, v, causal, variant)
        return step

    print(f"B{b} H{h} S{s} D{d} bf16", flush=True)
    race([
        Contender("full causal", mk("full"), q, (), n_hi=60, n_lo=10),
        Contender("bf16exp", mk("bf16exp"), q, (), n_hi=60, n_lo=10),
        Contender("noexp", mk("noexp"), q, (), n_hi=60, n_lo=10),
        Contender("nosoftmax", mk("nosoftmax"), q, (), n_hi=60, n_lo=10),
        Contender("full noncausal (2x flops)", mk("full", False), q, (),
                  n_hi=30, n_lo=5),
    ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
