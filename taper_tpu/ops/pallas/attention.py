"""Flash attention (fwd + bwd) Pallas kernels.

Beyond-reference scope: the reference has no attention/transformer anywhere
(SURVEY.md §5.7) — this is the framework's transformer extension, and the
workload where a hand kernel structurally beats XLA on TPU: XLA must
materialize the ``[B, H, S, S]`` score matrix in HBM (it cannot fuse a
softmax between two matmuls), so its attention is O(S²) HBM traffic.  The
flash formulation streams K/V blocks through VMEM with an online softmax,
keeping HBM traffic O(S·D): reads Q/K/V once, writes O once.

Forward (flash-attention-2 style):
  grid (B·H, Sq/bq, Sk/bk), KV innermost; scratch carries the running
  row-max ``m``, row-sum ``l`` and the f32 output accumulator across KV
  blocks; the output block is written once at the last KV step, and the
  per-row logsumexp is saved for the backward pass.

Backward: two kernels (the standard flash split) —
  * dQ:   grid (B·H, Sq/bq, Sk/bk), KV innermost, accumulates
          dQ += dS·K with dS = P∘(dP − δ)·scale, P recomputed from the
          saved logsumexp (no S×S materialization here either).
          δ = rowsum(dO∘O) is computed in-kernel at each q block's
          first KV step and exported as a second output;
  * dK/dV: grid (B·H, Sk/bk, Sq/bq), Q innermost, accumulates
          dV += Pᵀ·dO and dK += dSᵀ·Q, consuming the dQ kernel's δ.
  Backward block sizes are tuned separately from the forward
  (``_blocks_bwd``; the bwd tiles carry twice the live intermediates).

Numerics: softmax statistics, logits and accumulators are f32 regardless of
input dtype (bf16 inputs run bf16 MXU passes with f32 accumulation); causal
masking uses −inf pre-softmax.  Rows of a visited block CAN be fully
masked (sliding windows; per ring chunk) — the forward guards the
running max with a finite stand-in so their p/corr stay 0 instead of
NaN; in plain causal mode ``bq ≤ bk`` additionally guarantees every
visited row sees its diagonal.

Causality skips whole blocks above the diagonal via ``pl.when`` (compute
saved; the prefetch pipeline still streams the blocks).

Dispatch: sequence lengths must be multiples of 128 (the lane width) and
``Sq == Sk`` for causal; anything else falls back to the XLA oracle —
same measured-dispatch policy as the conv/pool families.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend

_NEG_INF = float("-inf")

# exp→exp2 trick (flash-attention-3 / splash style): the VPU's exp is
# exp2 plus a multiply by log2(e), so computing softmax in base 2 with
# log2(e) folded into the Q tile's scale saves one VPU op per score
# element.  All running maxima are then BASE-2 logits; the exported lse
# converts back with ln 2 at the (bq)-sized finalize.
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _q_scaled(q_ref, scale, lowp):
    """Load the (bq, d) Q tile with the softmax scale (and the exp2
    log2(e) factor) pre-folded — one VPU multiply per head-dim column
    instead of per score column (bk/d ≈ 32× fewer).  Scaled in f32,
    then cast to the dot input dtype."""
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    return q.astype(jnp.bfloat16) if lowp else q


def _dot_bf16_default() -> bool:
    """f32 inputs run their MXU dots as single-pass bf16 unless
    ``TAPER_ATTN_PREC=f32`` asks for the 3-pass f32 emulation.  This
    mirrors XLA's own default matmul precision (see
    benchmarks/probe_gemm.py: XLA's "f32" attention logits carry the
    same ~6e-4 single-pass-bf16 error) — softmax statistics and
    accumulators stay f32 either way.

    Interpret mode (CPU tests) always uses f32 — the knob is about MXU
    pass count, which the interpreter doesn't have; this also keeps the
    CPU parity tests exact.  Read at trace time; changing the env var
    after a function has been jitted does not retrace it (same caveat as
    the other TAPER_* knobs).
    """
    import os

    if _backend.pallas_interpret_mode():
        return False
    return os.environ.get("TAPER_ATTN_PREC", "bf16") != "f32"


def _dot_in(x, lowp):
    return x.astype(jnp.bfloat16) if (lowp and x.dtype == jnp.float32) \
        else x


def _blocks_env(var: str, sq: int, sk: int):
    """Parse a ``bq,bk`` override env var; loud on invalid combinations
    (a silent fallback would make sweep rows report the wrong config's
    time).  Returns None when the var is unset."""
    import os

    ov = os.environ.get(var)
    if not ov:
        return None
    bq, bk = (int(x) for x in ov.split(","))
    bq, bk = min(bq, sq), min(bk, sk)
    if not (sq % bq == 0 and sk % bk == 0 and bk % bq == 0):
        raise ValueError(
            f"{var}={ov!r} invalid for Sq={sq}, Sk={sk}: need "
            f"sq%bq==0, sk%bk==0, bk%bq==0 "
            f"(after clipping to ({bq}, {bk}))")
    if bq >= 2048:
        # hard refusal, not a clamp: bq=2048 wedges the Mosaic compile
        # (>25 min, never returns — ROUND4.md) on the bound forward;
        # nothing in the swept space ever wanted a 2048-row q tile
        raise ValueError(
            f"{var}={ov!r}: bq >= 2048 is refused (known Mosaic "
            f"compile wedge at 2048-row q tiles; use bq <= 1024)")
    return bq, bk


def _blocks(sq: int, sk: int, window=None, bf16_inputs=False):
    """Pick (bq, bk) — divisors of the sequence lengths with bq ≤ bk.

    Swept on v5e (benchmarks/tune_attention.py, S=2048 D=64 f32): bigger
    is better until VMEM pressure — (512, 2048) runs 28 TFLOP/s vs 16 at
    round-1's (256, 512); KV blocks of 2048·128 lanes are ~1 MB(bf16)–
    2 MB(f32), comfortably double-buffered.  Re-swept at bf16 S=4096
    (benchmarks/sweep_attn_fwd.py): (512, 2048) still wins among
    bq ≤ 512.  Post-triangular-grid re-sweep (r3, /tmp races):
    **bq = 1024** beats 512 for bf16 inputs (S4096 854→836 µs, S2048
    321→283 — taller q tiles amortize the per-grid-step cost) but hits
    the scoped-VMEM compile cliff at f32 S=4096, so it is enabled for
    bf16 inputs only.  ``TAPER_ATTN_FWD_BLOCKS=bq,bk`` overrides
    (trace time)."""
    ov = _blocks_env("TAPER_ATTN_FWD_BLOCKS", sq, sk)
    if ov:
        return ov
    def best(s, caps):
        for c in caps:
            if s % c == 0:
                return c
        return s
    caps = (2048, 1024, 512, 256, 128)
    if window is not None:
        # sliding window: KV blocks larger than the window defeat the
        # block-skip (a 2048-col block almost always intersects a
        # 512-wide window) — cap bk near the window size.
        wcap = max(128, 1 << (int(window) - 1).bit_length())
        caps = tuple(c for c in caps if c <= wcap) or (128,)
    bk = best(sk, caps)
    if bf16_inputs and window is None and sk >= 2048:
        # bf16 re-race: a 1024-wide KV block beats 2048 at BOTH S=2048
        # (326 vs 356 µs) and S=4096 (r5 re-sweep after the bound-max/
        # tri-grid changes: 633 vs 659 µs — the r3 sweep had the wider
        # block winning at S=4096, since inverted).  Net rule: bk ≤ 1024.
        bk = min(bk, 1024)
    bq_caps = (1024, 512, 256, 128) if bf16_inputs else (512, 256, 128)
    bq = best(sq, tuple(c for c in bq_caps if c <= bk))
    return bq, bk


def _blocks_bwd(sq, sk, window=None, bf16_inputs=False):
    """Backward block sizes, tuned independently of the forward.

    The bwd kernels keep ~4 live (bq, bk) f32 intermediates per tile
    (s, p, dp, ds) where the forward keeps two, so the forward's
    (512, 2048) tiles put ~16 MB of values in flight and stall the
    pipeline.  Swept on v5e (benchmarks/sweep_attn_bwd.py, S=4096 D=64
    bf16, full fwd+bwd): 256×256 4776 µs, 256×512 3269, 512×512 2787,
    **512×1024 2712**, 1024×1024 2712, 512×2048 (fwd's choice) 2907 —
    (512, 1024) is the f32 default.  Post-triangular-grid bf16 re-race
    (r3): **1024×1024** edges 512×1024 (2670 vs 2728 µs full fwd+bwd),
    enabled for bf16 inputs like the forward's tall tiles.
    ``TAPER_ATTN_BWD_BLOCKS=bq,bk`` overrides (read at trace time,
    like the other TAPER_* knobs)."""
    ov = _blocks_env("TAPER_ATTN_BWD_BLOCKS", sq, sk)
    if ov:
        return ov
    def best(s, caps):
        for c in caps:
            if s % c == 0:
                return c
        return s
    caps = (1024, 512, 256, 128)
    if window is not None:
        wcap = max(128, 1 << (int(window) - 1).bit_length())
        caps = tuple(c for c in caps if c <= wcap) or (128,)
    bk = best(sk, caps)
    bq_caps = (1024, 512, 256, 128) if bf16_inputs else (512, 256, 128)
    bq = best(sq, tuple(c for c in bq_caps if c <= bk))
    return bq, bk


def _mask(s, iq, ik, bq, bk, off, koff, causal, window):
    """Causal and/or sliding-window mask with global row/col offsets
    (sequence parallelism: a device's Q shard starts at global position
    ``off``; ring attention additionally streams K/V chunks starting at
    ``koff``).  ``window=W`` bounds the PAST only (cols > r−W); with
    ``causal=True`` that makes row r attend exactly [r−W+1, r].  Without
    causal, future cols stay visible (the XLA oracle matches)."""
    rows = off + iq * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = koff + ik * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ok = jnp.full(s.shape, True)
    if causal:
        ok &= rows >= cols
    if window is not None:
        ok &= cols > rows - window
    return jnp.where(ok, s, _NEG_INF)


def _fwd_kernel(off_ref, q_ref, k_ref, v_ref, *rest, scale, causal,
                window, bq, bk, nk, lowp, grid_banded=False, tri=None,
                chunk=None, has_seg=False):
    if has_seg:
        (sq_ref, sk_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc) = rest
    else:
        sq_ref = sk_ref = None
        (o_ref, lse_ref, m_sc, l_sc, acc_sc) = rest
    nsteps = pl.num_programs(2)
    if tri is not None:
        # TRIANGULAR grid: the inner dim enumerates ONLY the causal
        # band's (q block, kv block) pairs — zero idle grid steps, and
        # per-tile overcompute shrinks to the diagonal half-tiles.
        iq, ik = _tri_unrank(pl.program_id(2), tri)
        first = ik == 0
        last = ik == iq // (bk // bq)
    else:
        iq, ik = pl.program_id(1), pl.program_id(2)
        first = pl.program_id(2) == 0
        last = pl.program_id(2) == nsteps - 1
        if grid_banded:
            # grid covers only the band: step j maps to kv block start+j
            ik = _kv_band_start(iq, bq=bq, bk=bk, nk=nk, window=window,
                                steps=nsteps) + ik
    off = off_ref[0].astype(jnp.int32)
    koff = off_ref[1].astype(jnp.int32)

    @pl.when(first)
    def _init():
        m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    def body(masked=True):
        # scores are BASE-2 logits: scale·log2(e) is pre-folded into the
        # (bq, d) q tile (see _q_scaled) and the softmax runs on exp2 —
        # two fewer VPU ops per (bq, bk) score element.
        q = _q_scaled(q_ref, scale, lowp)
        s = jax.lax.dot_general(
            q, _dot_in(k_ref[0], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked and (causal or window is not None):
            s = _mask(s, iq, ik, bq, bk, off, koff, causal, window)
        if has_seg:
            # packed sequences: rows attend only their own segment
            same = (sq_ref[0, 0, :][:, None] == sk_ref[0, 0, :][None, :])
            s = jnp.where(same, s, _NEG_INF)
        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # fully-masked rows (possible under a sliding window / per ring
        # chunk) keep m_new = -inf; exp against a finite stand-in keeps
        # p = corr = 0 instead of NaN.
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp2(s - m_safe)
        corr = jnp.exp2(m_prev - m_safe)
        l_sc[:] = jnp.broadcast_to(
            l_sc[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True),
            l_sc.shape)
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        v = _dot_in(v_ref[0], lowp)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_sc[:] = acc_sc[:] * corr + pv

    def body_chunked():
        # DIAGONAL tile: split the KV block into ``chunk``-wide column
        # chunks and skip the ones fully above the causal bound — the
        # masked region of the diagonal tile costs neither MXU passes
        # nor exp (at (512, 2048) tiles the full-tile diagonal wastes
        # ~44% of its units; chunks of width bq align exactly with the
        # bound, so only the last running chunk is triangle-masked).
        q = _q_scaled(q_ref, scale, lowp)
        row_max = off + iq * bq + bq - 1
        for c in range(bk // chunk):
            @pl.when(koff + ik * bk + c * chunk <= row_max)
            def _(c=c):
                sl = slice(c * chunk, (c + 1) * chunk)
                s = jax.lax.dot_general(
                    q, _dot_in(k_ref[0, sl, :], lowp),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = _mask(s, iq, ik, bq, bk, off, koff + c * chunk,
                          causal, window)
                m_prev = m_sc[:, :1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True))
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

    run = True
    if tri is None:
        if causal:
            run = off + iq * bq + bq - 1 >= koff + ik * bk
        if window is not None:
            # newest window col for the OLDEST row in this q block
            in_win = (koff + ik * bk + bk - 1
                      > off + iq * bq - window)
            run = in_win if run is True else run & in_win
    if tri is not None and chunk is not None and chunk < bk:
        # only the last (diagonal) step pays the chunked bookkeeping
        pl.when(last)(body_chunked)
        pl.when(jnp.logical_not(last))(lambda: body(False))
    elif tri is not None:
        # triangular grid: only the LAST (diagonal-containing) tile has
        # masked positions — bk % bq == 0 makes every earlier tile
        # strictly sub-diagonal (max col = ik·bk+bk−1 < iq·bq = min
        # row), so those skip the iota/compare/select mask entirely.
        pl.when(last)(lambda: body(True))
        pl.when(jnp.logical_not(last))(lambda: body(False))
    elif run is True:
        body()
    else:
        pl.when(run)(body)

    @pl.when(last)
    def _fin():
        l = l_sc[:, :1]
        safe = jnp.maximum(l, 1e-30)
        o_ref[0] = jnp.where(l > 0, acc_sc[:] / safe,
                             0.0).astype(o_ref.dtype)
        # lse rows are replicated over 8 sublanes: Mosaic requires output
        # block sublane dims divisible by 8, and (1, bq) blocks are not.
        # m is a BASE-2 running max (exp2 softmax) — ln 2 converts the
        # exported lse back to natural log (the API/ring-merge unit).
        lse_ref[0] = jnp.broadcast_to(
            jnp.where(l > 0, m_sc[:, :1] * _LN2 + jnp.log(safe),
                      _NEG_INF)[:, 0][None, :], lse_ref.shape[1:])


def _fwd_kernel_bound(pred_ref, kn_ref, q_ref, k_ref, v_ref, o_ref,
                      lse_ref, m_sc, acc_sc, l_sc=None, *, scale, bq,
                      bk, tri, lowp, kvg):
    """Bound-max causal forward (the VPU-diet fast path) with an
    in-kernel per-q-block exact-max fallback.

    Softmax is shift-invariant: any upper bound b ≥ max(s) yields the
    exact acc/l ratio (numerator and denominator both carry 2^(m−b),
    which cancels in the finalize divide).  Using the per-row
    Cauchy–Schwarz bound ``b = ‖q̂_row‖₂ · max‖k‖₂`` instead of the
    running max deletes, per score element, the max-reduce pass AND all
    cross-tile corr bookkeeping (no corr exp2, no acc rescale) — and
    the row-sum ``l`` rides the PV matmul for free via a ones-padded V
    (at D≤64 the PV dot leaves ≥half of the MXU's 128 output lanes
    idle; a ones column turns one of them into Σp).  The body collapses
    to dot → exp2(s−b) → cast → dot.  At D == 128 (``l_sc`` given) the
    PV dot has no idle lanes to ride — ``l`` is an explicit VPU row-sum
    instead; the max-reduce/corr/rescale savings still apply.

    Numerical envelope: worst-case overshoot b − max(s) ≤ 2b (full
    anti-alignment), so p_max ≥ 2^(−2b); the dispatcher's guard
    ``max‖q̂‖·max‖k‖ ≤ 60`` keeps p_max ≥ 2^(−120), above f32/bf16
    min-normal 2^(−126).  Past the guard, ``pred_ref[0] == 0`` flips
    every block to the classic running-max update — the exact arm IS
    the fast arm plus the max/corr/rescale block, sharing the scores
    dot, the PV dot, the ones-column ``l`` and the finalize.  The
    branch must be (a) top-level per grid step (nesting the exact
    update between the two dots breaks Mosaic's software pipelining:
    34 vs 52 TFLOP/s measured) and (b) keyed on an SMEM INPUT — a
    per-block SMEM-scratch flag serializes the pipeline the same way,
    and a device-side lax.cond around two pallas_calls costs a flat
    ~250 µs flush (benchmarks/probe_bound_overhead.py).  Measured v5e
    B4 H8 S=4096 D=64 bf16 causal: 58.4 (bound) vs 43.9 TFLOP/s (exact
    at its tuned blocks); lax.cond dispatch reached only 47
    (benchmarks/proto_attn_boundmax.py, probe_bound_overhead.py)."""
    r = bk // bq
    iq, ik = _tri_unrank(pl.program_id(2), tri)
    # hoisted: program_id may not be bound inside pl.when closures
    # under interpret mode (CPU tests)
    g_kv = pl.program_id(0) // kvg
    first = ik == 0
    last = ik == iq // r
    d = q_ref.shape[-1]

    q = _q_scaled(q_ref, scale, lowp)
    lp = jnp.bfloat16 if lowp else jnp.float32

    fast = pred_ref[0] != 0

    def body(masked, blk_fast):
        s = jax.lax.dot_general(
            q, _dot_in(k_ref[0], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            # bk % bq == 0 ⇒ only the last (diagonal-containing) tile
            # has masked positions; earlier tiles skip the mask.
            s = _mask(s, iq, ik, bq, bk, 0, 0, True, None)
        if blk_fast:
            # m is the immutable per-row bound (finite): no max-reduce,
            # no corr, no rescale
            p = jnp.exp2(s - m_sc[:, :1])
            if l_sc is not None:
                l_sc[:] = l_sc[:] + jnp.sum(p, axis=1, keepdims=True)
        else:
            # classic running-max bookkeeping (guarded-out blocks)
            m_prev = m_sc[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1,
                                                keepdims=True))
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp2(s - m_safe)
            corr = jnp.exp2(m_prev - m_safe)
            acc_sc[:] = acc_sc[:] * corr
            if l_sc is not None:
                l_sc[:] = (l_sc[:] * corr
                           + jnp.sum(p, axis=1, keepdims=True))
            m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        if l_sc is None:
            v = jnp.pad(_dot_in(v_ref[0], lowp).astype(jnp.float32),
                        ((0, 0), (0, 128 - d)), constant_values=1.0)
        else:
            v = _dot_in(v_ref[0], lowp).astype(jnp.float32)
        pv = jax.lax.dot_general(
            p.astype(lp), v.astype(lp), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_sc[:] = acc_sc[:] + pv

    def arm(blk_fast):
        # NOTE the branch layout: the fast/exact split is the OUTERMOST
        # pl.when, with first/last handled inside each arm.  Both a
        # flat 4-arm logical_and layout and a nested pl.when between
        # the two dots break Mosaic's software pipelining (34 vs 52
        # TFLOP/s measured, with 10× the compile time).
        @pl.when(first)
        def _init():
            # per-row bound (base-2 logits: q̂ carries scale·log2e)
            qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1,
                                  keepdims=True))
            b_row = qn * kn_ref[g_kv]
            m_sc[:] = jnp.broadcast_to(
                b_row if blk_fast else jnp.full_like(b_row, _NEG_INF),
                m_sc.shape)
            acc_sc[:] = jnp.zeros_like(acc_sc)
            if l_sc is not None:
                l_sc[:] = jnp.zeros_like(l_sc)

        pl.when(last)(lambda: body(True, blk_fast))
        pl.when(jnp.logical_not(last))(lambda: body(False, blk_fast))

        @pl.when(last)
        def _fin():
            l = (acc_sc[:, d:d + 1] if l_sc is None
                 else l_sc[:, :1])
            # clamp at f32-tiny, NOT 1e-30: the bound arm admits rows
            # with p_max down to 2^-120 ≈ 7.5e-37 (dispatcher guard
            # ≤ 60), so a 1e-30 floor would silently mis-scale fully
            # anti-aligned rows inside the envelope by up to ~1e6
            safe = jnp.maximum(l, 1e-37)
            o_ref[0] = jnp.where(l > 0, acc_sc[:, :d] / safe,
                                 0.0).astype(o_ref.dtype)
            # lse in natural log (the API/ring-merge unit); m is the
            # bound (fast) or the running max (exact) — the shift
            # either way
            lse_ref[0] = jnp.broadcast_to(
                jnp.where(l > 0, m_sc[:, :1] * _LN2 + jnp.log(safe),
                          _NEG_INF)[:, 0][None, :], lse_ref.shape[1:])

    pl.when(fast)(lambda: arm(True))
    pl.when(jnp.logical_not(fast))(lambda: arm(False))


def _dq_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
               dl_ref, *rest, scale, causal, window, bq, bk, nk, lowp,
               grid_banded=False, tri=None, chunk=None, has_seg=False):
    if has_seg:
        (sq_ref, sk_ref, dq_ref, delta_ref, dq_sc, dl_sc) = rest
    else:
        sq_ref = sk_ref = None
        (dq_ref, delta_ref, dq_sc, dl_sc) = rest
    nsteps = pl.num_programs(2)
    if tri is not None:
        # triangular grid (see _fwd_kernel): q-major band enumeration
        iq, ik = _tri_unrank(pl.program_id(2), tri)
        first = ik == 0
        last = ik == iq // (bk // bq)
    else:
        iq, ik = pl.program_id(1), pl.program_id(2)
        first = pl.program_id(2) == 0
        last = pl.program_id(2) == nsteps - 1
        if grid_banded:
            ik = _kv_band_start(iq, bq=bq, bk=bk, nk=nk, window=window,
                                steps=nsteps) + ik
    off = off_ref[0].astype(jnp.int32)
    koff = off_ref[1].astype(jnp.int32)

    @pl.when(first)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)
        # δ = rowsum(dO∘O) − dlse, computed ONCE per q block in-kernel
        # (folding the former XLA preprocess pass into the first KV
        # step) and exported for the dK/dV kernel to reuse.
        drow = jnp.sum(do_ref[0].astype(jnp.float32)
                       * o_ref[0].astype(jnp.float32), axis=1)
        drow = drow - dl_ref[0, 0, :]
        dl_sc[:] = jnp.broadcast_to(drow[:, None], dl_sc.shape)
        delta_ref[0] = jnp.broadcast_to(drow[None, :],
                                        delta_ref.shape[1:])

    def body(masked=True):
        # base-2 logits (scale·log2 e folded into q — see _q_scaled);
        # the ds·scale multiply is deferred to one (bq, d) multiply at
        # the finalize instead of a (bq, bk) multiply per tile.
        q = _q_scaled(q_ref, scale, lowp)
        k = _dot_in(k_ref[0], lowp)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked and (causal or window is not None):
            s = _mask(s, iq, ik, bq, bk, off, koff, causal, window)
        if has_seg:
            same = (sq_ref[0, 0, :][:, None] == sk_ref[0, 0, :][None, :])
            s = jnp.where(same, s, _NEG_INF)
        # fully-masked rows saved lse = -inf (sliding window / ring
        # chunk); exp(s - (-inf)) would be exp(-inf + inf) = NaN.  A
        # finite stand-in makes p = exp(-inf - 0) = 0 for those rows
        # (mirrors the forward's m_safe guard).
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        p = jnp.exp2(s - lse2[:, None])
        dp = jax.lax.dot_general(
            _dot_in(do_ref[0], lowp), _dot_in(v_ref[0], lowp),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dl_sc[:, :1])
        dq_sc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body_chunked():
        # diagonal tile, chunk-skipped (see _fwd_kernel.body_chunked);
        # no online-softmax coupling here — lse is saved, so chunks are
        # independent accumulations into dq_sc.
        q = _q_scaled(q_ref, scale, lowp)
        do = _dot_in(do_ref[0], lowp)
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        row_max = off + iq * bq + bq - 1
        for c in range(bk // chunk):
            @pl.when(koff + ik * bk + c * chunk <= row_max)
            def _(c=c):
                sl = slice(c * chunk, (c + 1) * chunk)
                k_c = _dot_in(k_ref[0, sl, :], lowp)
                s = jax.lax.dot_general(
                    q, k_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = _mask(s, iq, ik, bq, bk, off, koff + c * chunk,
                          causal, window)
                p = jnp.exp2(s - lse2[:, None])
                dp = jax.lax.dot_general(
                    do, _dot_in(v_ref[0, sl, :], lowp),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - dl_sc[:, :1])
                dq_sc[:] += jax.lax.dot_general(
                    ds.astype(k_c.dtype), k_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    run = True
    if tri is None:
        if causal:
            run = off + iq * bq + bq - 1 >= koff + ik * bk
        if window is not None:
            # newest window col for the OLDEST row in this q block
            in_win = (koff + ik * bk + bk - 1
                      > off + iq * bq - window)
            run = in_win if run is True else run & in_win
    if tri is not None and chunk is not None and chunk < bk:
        pl.when(last)(body_chunked)
        pl.when(jnp.logical_not(last))(lambda: body(False))
    elif tri is not None:
        # mask-free fast path for strictly sub-diagonal tiles (see
        # _fwd_kernel's dispatch comment)
        pl.when(last)(lambda: body(True))
        pl.when(jnp.logical_not(last))(lambda: body(False))
    elif run is True:
        body()
    else:
        pl.when(run)(body)

    @pl.when(last)
    def _fin():
        # the deferred ds·scale (see body): one multiply on (bq, d)
        dq_ref[0] = (dq_sc[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel_t(off_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                  dk_ref, dv_ref, dk_sc, dv_sc, *, scale, causal, window,
                  bq, bk, nq, lowp, grid_banded=False):
    """Transposed dK/dV formulation: the score tile is computed as
    sᵀ = K·Qᵀ ``(bk, bq)`` so all four dots are NT/NN forms —
    dV += Pᵀ·dO and dK += dSᵀ·Q become natural NN contractions over bq
    instead of the row-major kernel's TN forms (contraction over the
    sublane axis of both operands).  Measured NEUTRAL on v5e at bf16
    S=4096 (2699 vs 2704 µs full fwd+bwd — Mosaic evidently lowers the
    TN dots without a separate transpose pass); kept as the documented
    experiment, selected by ``TAPER_ATTN_DKV_T=1``."""
    ik, iq = pl.program_id(1), pl.program_id(2)
    nsteps = pl.num_programs(2)
    if grid_banded:
        iq = _q_band_start(ik, bq=bq, bk=bk, nq=nq,
                           steps=nsteps) + iq
    off = off_ref[0].astype(jnp.int32)
    koff = off_ref[1].astype(jnp.int32)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    def body():
        q = _q_scaled(q_ref, scale, lowp)
        k = _dot_in(k_ref[0], lowp)
        do = _dot_in(do_ref[0], lowp)
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bk, bq)
        if causal or window is not None:
            # transposed tile: axis 0 = kv cols, axis 1 = q rows
            kcols = koff + ik * bk + jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 0)
            qrows = off + iq * bq + jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1)
            ok = jnp.full(st.shape, True)
            if causal:
                ok &= qrows >= kcols
            if window is not None:
                ok &= kcols > qrows - window
            st = jnp.where(ok, st, _NEG_INF)
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        pt = jnp.exp2(st - lse2[None, :])
        dv_sc[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            _dot_in(v_ref[0], lowp), do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = pt * (dpt - dl_ref[0, 0, :][None, :])
        dk_sc[:] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run = True
    if causal:
        run = off + iq * bq + bq - 1 >= koff + ik * bk
    if window is not None:
        in_win = (koff + ik * bk + bk - 1
                  > off + iq * bq - window)
        run = in_win if run is True else run & in_win
    if run is True:
        body()
    else:
        pl.when(run)(body)

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _fin():
        # ln 2 recovers ds·scale·q from the scaled-q accumulation
        dk_ref[0] = (dk_sc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


def _dkv_kernel(off_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                *rest, scale, causal, window, bq, bk,
                nq, lowp, grid_banded=False, tri=None, chunk=None,
                has_seg=False):
    if has_seg:
        (sq_ref, sk_ref, dk_ref, dv_ref, dk_sc, dv_sc) = rest
    else:
        sq_ref = sk_ref = None
        (dk_ref, dv_ref, dk_sc, dv_sc) = rest
    nsteps = pl.num_programs(2)
    partial = None
    if tri is not None:
        # triangular grid, k-major: k block j is attended by q blocks
        # j·r..nq−1 (r = bk/bq); local step ``loc`` walks that span.
        ik, loc = _tri_unrank(pl.program_id(2), tri)
        iq = ik * (bk // bq) + loc
        first = loc == 0
        last = loc == nq - 1 - ik * (bk // bq)
        # q blocks ending before this k block's last column leave the
        # tile's right side fully masked — the chunk-skip targets
        partial = loc < (bk // bq) - 1
        # tiles past the diagonal span (loc ≥ bk/bq) are FULL — every
        # row of the q block sees every column of this k block, so the
        # causal mask is the identity there and is skipped entirely.
        diag = loc < (bk // bq)
    else:
        ik, iq = pl.program_id(1), pl.program_id(2)
        first = pl.program_id(2) == 0
        last = pl.program_id(2) == nsteps - 1
        if grid_banded:
            # band over q blocks for this k block (causal: start at the
            # diagonal; window bounds the height)
            iq = _q_band_start(ik, bq=bq, bk=bk, nq=nq,
                               steps=nsteps) + iq
    off = off_ref[0].astype(jnp.int32)
    koff = off_ref[1].astype(jnp.int32)

    @pl.when(first)
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    def body(masked=True):
        # base-2 logits from the pre-scaled q (see _q_scaled).  dK is
        # accumulated against the SCALED q, so the finalize multiplies
        # by ln 2 (= scale/(scale·log2 e)) to recover ds·scale·q — no
        # per-tile (bq, bk) scale multiply anywhere.
        q = _q_scaled(q_ref, scale, lowp)
        k = _dot_in(k_ref[0], lowp)
        do = _dot_in(do_ref[0], lowp)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked and (causal or window is not None):
            s = _mask(s, iq, ik, bq, bk, off, koff, causal, window)
        if has_seg:
            same = (sq_ref[0, 0, :][:, None] == sk_ref[0, 0, :][None, :])
            s = jnp.where(same, s, _NEG_INF)
        # same -inf lse guard as _dq_kernel (fully-masked rows)
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        p = jnp.exp2(s - lse2[:, None])
        pv = p.astype(do.dtype)
        dv_sc[:] += jax.lax.dot_general(
            pv, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, _dot_in(v_ref[0], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dl_ref[0, 0, :][:, None])
        dk_sc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body_chunked():
        # partial tile: chunk the KV (column) axis and skip chunks past
        # the q block's last row (see _fwd_kernel.body_chunked); each
        # chunk accumulates into its slice of the dk/dv scratch.
        q = _q_scaled(q_ref, scale, lowp)
        do = _dot_in(do_ref[0], lowp)
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        dl_row = dl_ref[0, 0, :]
        row_max = off + iq * bq + bq - 1
        for c in range(bk // chunk):
            @pl.when(koff + ik * bk + c * chunk <= row_max)
            def _(c=c):
                sl = slice(c * chunk, (c + 1) * chunk)
                s = jax.lax.dot_general(
                    q, _dot_in(k_ref[0, sl, :], lowp),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = _mask(s, iq, ik, bq, bk, off, koff + c * chunk,
                          causal, window)
                p = jnp.exp2(s - lse2[:, None])
                pv = p.astype(do.dtype)
                dv_sc[sl, :] += jax.lax.dot_general(
                    pv, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    do, _dot_in(v_ref[0, sl, :], lowp),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - dl_row[:, None])
                dk_sc[sl, :] += jax.lax.dot_general(
                    ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    run = True
    if tri is None:
        if causal:
            run = off + iq * bq + bq - 1 >= koff + ik * bk
        if window is not None:
            # newest window col for the OLDEST row in this q block
            in_win = (koff + ik * bk + bk - 1
                      > off + iq * bq - window)
            run = in_win if run is True else run & in_win
    if (tri is not None and chunk is not None and chunk < bk
            and partial is not None):
        pl.when(partial)(body_chunked)
        pl.when(jnp.logical_not(partial))(body)
    elif tri is not None:
        # mask only diagonal-straddling tiles (loc < bk/bq); the rest
        # of each k block's q span is strictly below the diagonal
        pl.when(diag)(lambda: body(True))
        pl.when(jnp.logical_not(diag))(lambda: body(False))
    elif run is True:
        body()
    else:
        pl.when(run)(body)

    @pl.when(last)
    def _fin():
        # ln 2 recovers ds·scale·q from the scaled-q accumulation (see
        # body); dV is scale-free.
        dk_ref[0] = (dk_sc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                      dl_ref, dq_ref, dk_ref, dv_ref, dq_sc, dk_sc,
                      dv_sc, delta_sc, *, scale, bq, bk, tri, lowp,
                      nq):
    """Single-sweep fused backward: dQ, dK and dV from ONE pass over
    the causal band (k-major triangular grid).

    The split formulation (``_dq_kernel`` + ``_dkv_kernel``) sweeps the
    band twice, recomputing the score and dP tiles in each kernel —
    7 MXU passes per tile pair and 2 exp2 sweeps where the math needs
    5 and 1.  Here every (iq, ik) tile computes s/p/dp once and feeds
    all three grads:

      * dV and dK accumulate in per-k-block VMEM scratch (as in
        ``_dkv_kernel``), written back when the k block's q span ends;
      * dQ accumulates into a FULL-LENGTH (sq, d) f32 VMEM scratch at
        dynamic row offset iq·bq — the revisit order over q blocks is
        non-contiguous under the k-major grid, which is exactly why
        the split design needed a second kernel; a resident accumulator
        removes that constraint.  Written once at the row's final grid
        step.  VMEM cost sq·d·4 (1 MB at S=4096 D=64) — the dispatcher
        falls back to the split kernels past 4 MB;
      * δ = rowsum(dO∘O) − dlse is computed once per q block during the
        ik == 0 span (which visits EVERY q block) into a (nq, 8, bq)
        scratch, and read back on later k rows — the split design's
        export/import through HBM becomes a VMEM-resident table.

    Only the causal tri-grid no-window/no-segment case (the training
    hot path) dispatches here; everything else keeps the split kernels.
    """
    r = bk // bq
    ik, loc = _tri_unrank(pl.program_id(2), tri)
    iq = ik * r + loc
    first_k = loc == 0
    last_k = loc == nq - 1 - ik * r
    diag = loc < r          # tile straddles the diagonal → mask
    t = pl.program_id(2)
    first_g = t == 0
    last_g = t == sum(tri) - 1

    @pl.when(first_g)
    def _init_dq():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    @pl.when(first_k)
    def _init_dkv():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    @pl.when(ik == 0)
    def _delta():
        # ik == 0 visits q blocks 0..nq−1 in order: compute δ on first
        # touch, reuse from scratch on every later k row.
        drow = jnp.sum(do_ref[0].astype(jnp.float32)
                       * o_ref[0].astype(jnp.float32), axis=1)
        drow = drow - dl_ref[0, 0, :]
        delta_sc[iq] = jnp.broadcast_to(drow[None, :],
                                        delta_sc.shape[1:])

    def body(masked):
        q = _q_scaled(q_ref, scale, lowp)
        k = _dot_in(k_ref[0], lowp)
        do = _dot_in(do_ref[0], lowp)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            s = _mask(s, iq, ik, bq, bk, 0, 0, True, None)
        # fully-masked rows saved lse = −inf; finite stand-in keeps
        # p = 0 instead of NaN (same guard as the split kernels)
        lse_row = lse_ref[0, 0, :]
        lse2 = jnp.where(jnp.isfinite(lse_row), lse_row, 0.0) * _LOG2E
        p = jnp.exp2(s - lse2[:, None])
        dp = jax.lax.dot_general(
            do, _dot_in(v_ref[0], lowp), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_sc[iq, 0, :][:, None])
        dv_sc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_sc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dq accumulates at dynamic LEADING index (the cheap indexing
        # form — a 2D pl.ds sublane-offset RMW lowered ~1.7× slower)
        dq_sc[iq] = dq_sc[iq] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # only diagonal-straddling tiles (loc < r) carry masked positions
    pl.when(diag)(lambda: body(True))
    pl.when(jnp.logical_not(diag))(lambda: body(False))

    @pl.when(last_k)
    def _fin_dkv():
        # ln 2 recovers ds·scale·q from the scaled-q accumulation;
        # dV is scale-free (see _dkv_kernel)
        dk_ref[0] = (dk_sc[:] * _LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].astype(dv_ref.dtype)

    @pl.when(last_g)
    def _fin_dq():
        # deferred ds·scale (see _dq_kernel), one multiply on (sq, d);
        # (nq, bq, d) row-major is memory-identical to (sq, d)
        dq_ref[0] = (dq_sc[...].reshape(dq_ref.shape[1:])
                     * scale).astype(dq_ref.dtype)


_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


def _nkb(bq, bk, window):
    """Banded grid length over KV blocks for a window: the widest row
    band spans bq + window - 1 columns."""
    return (bq + window - 2) // bk + 2


def _kv_band_start(i, *, bq, bk, nk, window, steps):
    """First KV block of the banded grid for q block ``i`` — THE single
    source of the band formula, shared by the kernels and the BlockSpec
    index maps (they must agree exactly).  Clipped so the steps-long
    band lies inside [0, nk-1]; blocks it covers beyond the true band
    are rejected by the kernels' causal/window run predicates."""
    lo = (i * bq - (window - 1)) // bk
    return jnp.clip(lo, 0, nk - steps)


def _q_band_start(j, *, bq, bk, nq, steps):
    """First Q block of the banded dK/dV grid for k block ``j``
    (causal: the diagonal row block)."""
    lo = (j * bk) // bq
    return jnp.clip(lo, 0, nq - steps)


def _tri_counts_fwd(nq, r):
    """Inner-steps per q block for the causal TRIANGULAR grid: q block
    ``i`` (rows [i·bq, i·bq+bq)) needs kv blocks 0..i//r where
    ``r = bk/bq`` — count i//r + 1.  Σ over i is the grid length."""
    return tuple(i // r + 1 for i in range(nq))


def _tri_counts_dkv(nq, nk, r):
    """Inner-steps per k block for the causal dK/dV triangular grid:
    k block ``j`` (cols [j·bk, j·bk+bk)) is attended by q blocks
    j·r..nq−1 — count nq − j·r."""
    return tuple(nq - j * r for j in range(nk))


def _tri_unrank(t, counts):
    """Invert the linearized triangular grid: step ``t`` → (row, local
    step within the row).  Static-unrolled integer compares (no sqrt);
    runs on the scalar core in both the BlockSpec index maps and the
    kernels — they must agree exactly, so this is the single source."""
    offs = [0]
    for c in counts[:-1]:
        offs.append(offs[-1] + c)
    row = jnp.int32(0)
    for o in offs[1:]:
        row = row + (t >= o).astype(jnp.int32)
    off = jnp.int32(0)
    for i, c in enumerate(counts[:-1]):
        off = off + c * (row > i).astype(jnp.int32)
    return row, t - off


def _kv_band(i, j, *, bq, bk, nk, causal, window):
    """Banded KV block index for q block ``i`` at inner step ``j``:
    out-of-band steps clip to the band edge, so consecutive grid steps
    revisit the same block and Pallas elides their HBM fetches (their
    compute is already skipped by the kernels' run predicate).  Only
    valid when q/k offsets are statically zero."""
    lo = 0
    hi = nk - 1
    if window is not None:
        lo = jnp.maximum((i * bq - (window - 1)) // bk, 0)
    if causal:
        hi = jnp.minimum((i * bq + bq - 1) // bk, nk - 1)
    return jnp.clip(j, lo, hi)


def _q_band(j, i, *, bq, bk, nq, causal, window):
    """Banded Q block index for k block ``j`` (the dK/dV transposed
    grid): rows attending col c lie in [c, c+window-1] (causal,
    windowed)."""
    lo = 0
    hi = nq - 1
    if causal:
        lo = jnp.minimum((j * bk) // bq, nq - 1)
    if window is not None:
        hi = jnp.minimum((j * bk + bk - 1 + window - 1) // bq, nq - 1)
    return jnp.clip(i, lo, hi)


def _seg_spec(base_spec, blk, h):
    """Segment-id BlockSpec riding an existing q/k block spec: same
    block coordinate, batch recovered from the fused (b·h) grid dim.
    Segment inputs are 8-sublane-replicated like the lse rows (Mosaic
    wants sublane dims divisible by 8)."""
    im = base_spec.index_map
    return pl.BlockSpec(
        (1, 8, blk), lambda *a: (im(*a)[0] // h, 0, im(*a)[1]))


def _seg8(seg, b, s):
    return jnp.broadcast_to(
        jnp.asarray(seg, jnp.int32)[:, None, :], (b, 8, s))


def _flash_fwd(q, k, v, off, causal, scale, window=None, banded=False,
               seg=None, heads=None):
    # ``off``: f32[2] = (q_offset, k_offset)
    #
    # ``heads=H`` switches to the TRANSPOSE-FREE layout: q [B, Sq, H·D],
    # k/v [B, Sk, Hkv·D] (the projection GEMMs' natural output), with o
    # returned [B, Sq, H·D].  The kernel bodies are IDENTICAL — a
    # (1, bq, d) block read from [B·H, S, D] at (g, row, 0) and from
    # [B, S, H·D] at (g//H, row, g%H) is the same VMEM tile — only the
    # BlockSpec index maps change, so the [B,S,HD]→[B,H,S,D] relayout
    # copies around every attention call (the largest non-matmul item
    # in the 170M train-step budget, benchmarks/probe_mfu_budget.py)
    # disappear.  Requires D % 128 == 0 (lane-tile-aligned head slices;
    # enforced by the public wrapper).
    if heads is None:
        b, h, sq, d = q.shape
        sk = k.shape[2]
        hkv = k.shape[1]
        assert h % hkv == 0 and v.shape[1] == hkv, \
            (q.shape, k.shape, v.shape)
    else:
        b, sq, e = q.shape
        h = heads
        assert e % h == 0, (q.shape, h)
        d = e // h
        sk = k.shape[1]
        hkv = k.shape[2] // d
        assert h % hkv == 0 and k.shape[2] == hkv * d \
            and v.shape[2] == hkv * d, (q.shape, k.shape, v.shape, h)
        assert seg is None, "segment_ids require the [B,H,S,D] layout"
    assert sq % 128 == 0 and sk % 128 == 0, (
        f"flash_attention needs lane-aligned sequence lengths "
        f"(multiples of 128); got Sq={sq}, Sk={sk} — use ops.attention, "
        f"which falls back to the XLA oracle for these shapes")
    # GQA/MQA: fewer K/V heads than Q heads, read NATIVELY — the KV
    # BlockSpec index maps divide the fused (b·h) grid coordinate by the
    # group size (q heads kvh·g..kvh·g+g−1 share kv head kvh), so the
    # compact K/V are never materialized at q-head width in HBM (the
    # jnp.repeat the module layer used to do).
    kvg = h // hkv
    bq, bk = _blocks(sq, sk, window,
                     bf16_inputs=q.dtype == jnp.bfloat16)
    assert bk % bq == 0, (
        f"internal: bk={bk} must be a multiple of bq={bq} (the causal "
        f"no-fully-masked-row invariant)")
    nq, nk = sq // bq, sk // bk
    bh = b * h
    if heads is None:
        q3 = q.reshape(bh, sq, d)
        k3 = k.reshape(b * hkv, sk, d)
        v3 = v.reshape(b * hkv, sk, d)
        # batch/head block coordinates of grid index g for q-side and
        # kv-side arrays (rank-3 either way; see the layout note above)
        qb, qh_ = (lambda g: g), (lambda g: 0)
        kb, kh_ = (lambda g: g // kvg), (lambda g: 0)
    else:
        q3, k3, v3 = q, k, v
        qb, qh_ = (lambda g: g // h), (lambda g: g % h)
        kb, kh_ = (lambda g: g // h), (lambda g: (g % h) // kvg)

    # banded GRIDS assume causal geometry (no future blocks); a
    # non-causal window keeps the full sweep with clipped fetches.
    grid_banded = banded == "band" and window is not None and causal
    tri = None
    if banded == "tri" and causal and window is None:
        # triangular grid: 1D inner dim over exactly the band's block
        # pairs; (qi, ki) recovered by _tri_unrank in kernel AND maps.
        tri = _tri_counts_fwd(nq, bk // bq)
        steps = sum(tri)
        q_idx = lambda g, i, t: (qb(g), _tri_unrank(t, tri)[0], qh_(g))
        kv_idx = lambda g, i, t: (kb(g), _tri_unrank(t, tri)[1], kh_(g))
        lse_idx = lambda g, i, t: (g, 0, _tri_unrank(t, tri)[0])
        grid = (bh, 1, steps)
    elif grid_banded:
        # the grid only covers the diagonal band of KV blocks
        steps = min(_nkb(bq, bk, window), nk)
        start = functools.partial(_kv_band_start, bq=bq, bk=bk, nk=nk,
                                  window=window, steps=steps)
        kv_idx = lambda g, i, j: (kb(g), start(i) + j, kh_(g))
    elif banded:
        kvmap = functools.partial(_kv_band, bq=bq, bk=bk, nk=nk,
                                  causal=causal, window=window)
        kv_idx = lambda g, i, j: (kb(g), kvmap(i, j), kh_(g))
        steps = nk
    else:
        kv_idx = lambda g, i, j: (kb(g), j, kh_(g))
        steps = nk
    if tri is None:
        q_idx = lambda g, i, j: (qb(g), i, qh_(g))
        lse_idx = lambda g, i, j: (g, 0, i)
        grid = (bh, nq, steps)

    import os as _os
    # TAPER_ATTN_CHUNK=1 splits each diagonal tile into bq-wide column
    # chunks and pl.when-skips the fully-masked ones.  Measured NEGATIVE
    # on v5e (benchmarks/sweep_attn_tri + /tmp race, bf16 S=4096: fwd
    # 869 → 1088 µs): the 4 small dots + 4× online-softmax bookkeeping
    # cost more than the ~25% masked compute they save.  Kept as a
    # documented experiment, off by default (same policy as
    # TAPER_ATTN_DKV_T).
    chunk = (bq if tri is not None and seg is None
             and _os.environ.get("TAPER_ATTN_CHUNK", "0") == "1" else None)
    q_spec = pl.BlockSpec((1, bq, d), q_idx)
    kv_spec = pl.BlockSpec((1, bk, d), kv_idx)
    in_specs = [_SMEM_SPEC, q_spec, kv_spec, kv_spec]
    args = [off, q3, k3, v3]
    if seg is not None:
        # the kv spec's rows run over b·hkv, so its batch divisor is hkv
        in_specs += [_seg_spec(q_spec, bq, h), _seg_spec(kv_spec, bk, hkv)]
        args += [_seg8(seg, b, sq), _seg8(seg, b, sk)]
    # Bound-max FAST PATH (causal tri grid, no window/segments/offsets):
    # see _fwd_kernel_bound.  At D ≤ 64 the ones-padded V rides the PV
    # dot's idle lanes (``l`` for free); at D == 128 ``l`` is an
    # explicit VPU row-sum (the max-reduce/corr/rescale savings remain).
    # A runtime SMEM predicate selects it in-kernel whenever the
    # numerical envelope holds (an XLA-level lax.cond costs a flat
    # ~250 µs pipeline flush — benchmarks/probe_bound_overhead).
    # bf16-only: the ones-column ``l`` is accumulated from the SAME
    # bf16-rounded p as the PV products (self-consistent weights), but
    # that costs ~1e-2 absolute vs the exact kernel's f32 VPU row-sums —
    # below bf16 noise, above what f32 callers expect.
    use_bound = (tri is not None and seg is None and d <= 128
                 and q.dtype == jnp.bfloat16
                 and _os.environ.get("TAPER_ATTN_BOUNDMAX", "1") == "1")
    o_shape = jax.ShapeDtypeStruct(
        (bh, sq, d) if heads is None else (b, sq, h * d), q.dtype)
    if not use_bound:
        o3, lse = pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, causal=causal,
                              window=window, bq=bq, bk=bk, nk=nk,
                              lowp=_dot_bf16_default(),
                              grid_banded=grid_banded, tri=tri,
                              chunk=chunk, has_seg=seg is not None),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, bq, d), q_idx),
                pl.BlockSpec((1, 8, bq), lse_idx),
            ],
            out_shape=[
                o_shape,
                jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel",
                                     "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq * sk * d // (2 if causal else 1),
                # K/V are read at their compact Hkv width under GQA
                bytes_accessed=q.dtype.itemsize
                * (bh * 2 * sq + b * hkv * 2 * sk) * d,
                transcendentals=bh * sq * sk),
            interpret=_backend.pallas_interpret_mode(),
        )(*args)
        return (o3.reshape(b, h, sq, d) if heads is None else o3), lse

    def bestdiv(s, caps):
        for c in caps:
            if s % c == 0:
                return c
        return s
    # square r=1 tiles; TAPER_ATTN_FWD_BLOCKS=bq,bq overrides for sweeps
    ovf = _blocks_env("TAPER_ATTN_FWD_BLOCKS", sq, sq)
    bqf = ovf[0] if ovf else bestdiv(sq, (1024, 512, 256, 128))
    trif = _tri_counts_fwd(sq // bqf, 1)
    qf_idx = lambda g, i, t: (qb(g), _tri_unrank(t, trif)[0], qh_(g))
    kvf_idx = lambda g, i, t: (kb(g), _tri_unrank(t, trif)[1], kh_(g))
    lsef_idx = lambda g, i, t: (g, 0, _tri_unrank(t, trif)[0])

    # guard: max‖q̂‖·max‖k‖ ≤ 60 keeps p_max ≥ 2^(−120) (above f32/bf16
    # min-normal) even under full anti-alignment — past it, pred = 0
    # flips the kernel to its exact-max arms.  The norm pre-pass is one
    # serialized HBM sweep of Q and K (~40 µs at B4 S=4096); pred must
    # be an SMEM INPUT, not an in-kernel per-block decision — a pl.when
    # on SMEM scratch written by an earlier grid step serializes the
    # Mosaic pipeline (34 vs 52 TFLOP/s measured) and a lax.cond
    # around two pallas_calls costs a flat ~250 µs flush.
    if heads is None:
        kn = jnp.sqrt(jnp.max(
            jnp.sum(k3.astype(jnp.float32) ** 2, axis=-1), axis=-1))
        qn_max = jnp.sqrt(jnp.max(
            jnp.sum(q3.astype(jnp.float32) ** 2, axis=-1)))
    else:
        # per-head norms from the head-fused layout; the flat (b·hkv,)
        # ordering matches the kernel's kn_ref[g // kvg] index either
        # way ((b·h + qh)//kvg == b·hkv + qh//kvg since kvg | h)
        kn = jnp.sqrt(jnp.max(jnp.sum(
            k3.astype(jnp.float32).reshape(b, sk, hkv, d) ** 2,
            axis=-1), axis=1)).reshape(-1)
        qn_max = jnp.sqrt(jnp.max(jnp.sum(
            q3.astype(jnp.float32).reshape(b, sq, h, d) ** 2, axis=-1)))
    pred = (qn_max * (scale * _LOG2E) * jnp.max(kn)
            <= 60.0).astype(jnp.int32)[None]
    o3, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bound, scale=scale, bq=bqf,
                          bk=bqf, tri=trif, lowp=True, kvg=kvg),
        grid=(bh, 1, sum(trif)),
        in_specs=[_SMEM_SPEC, _SMEM_SPEC,
                  pl.BlockSpec((1, bqf, d), qf_idx),
                  pl.BlockSpec((1, bqf, d), kvf_idx),
                  pl.BlockSpec((1, bqf, d), kvf_idx)],
        out_specs=[pl.BlockSpec((1, bqf, d), qf_idx),
                   pl.BlockSpec((1, 8, bqf), lsef_idx)],
        out_shape=[
            o_shape,
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bqf, 128), jnp.float32),
                        pltpu.VMEM((bqf, 128), jnp.float32)]
        + ([pltpu.VMEM((bqf, 128), jnp.float32)] if d == 128 else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d // 2,
            bytes_accessed=q.dtype.itemsize
            * (bh * 2 * sq + b * hkv * 2 * sk) * d,
            transcendentals=bh * sq * sk),
        interpret=_backend.pallas_interpret_mode(),
    )(pred, kn, q3, k3, v3)
    return (o3.reshape(b, h, sq, d) if heads is None else o3), lse


def _flash_bwd_impl(q, k, v, off, o, lse, do, causal, scale,
                    dlse=None, window=None, banded=False, seg=None,
                    heads=None):
    # (banded grids need statically-zero offsets; guaranteed by callers)
    #
    # ``heads=H``: transpose-free [B, S, H·D] layout for q/k/v/o/do and
    # the returned dq/dk/dv — see the layout note on _flash_fwd.  The
    # internal lse/δ tables stay [B·H, 8, S] either way.
    if heads is None:
        b, h, sq, d = q.shape
        sk = k.shape[2]
        hkv = k.shape[1]
    else:
        b, sq, e = q.shape
        h = heads
        d = e // h
        sk = k.shape[1]
        hkv = k.shape[2] // d
        assert seg is None, "segment_ids require the [B,H,S,D] layout"
    # GQA (see _flash_fwd): K/V are read compactly via g//kvg index
    # maps; dK/dV are produced at q-head width (each q head of a group
    # contributes an independent partial) and group-summed after the
    # kernel — the same reduction jnp.repeat's VJP would do, without
    # ever materializing repeated K/V on the forward side.
    kvg = h // hkv
    bq, bk = _blocks_bwd(sq, sk, window,
                         bf16_inputs=q.dtype == jnp.bfloat16)
    nq, nk = sq // bq, sk // bk
    bh = b * h
    # d(lse)/ds = p, so an lse cotangent folds into the same
    # ds = p*(dp − δ) pipeline as δ −= dlse; δ itself (rowsum(dO∘O)) is
    # computed inside the dQ kernel (one row-reduction per q block) and
    # exported for the dK/dV kernel — no separate XLA pass.
    if dlse is not None:
        dl_in = jnp.broadcast_to(
            dlse.reshape(bh, 1, sq).astype(jnp.float32), (bh, 8, sq))
    else:
        dl_in = jnp.zeros((bh, 8, sq), jnp.float32)
    if heads is None:
        q3 = q.reshape(bh, sq, d)
        k3 = k.reshape(b * hkv, sk, d)
        v3 = v.reshape(b * hkv, sk, d)
        do3 = do.reshape(bh, sq, d)
        o3 = o.reshape(bh, sq, d)
        qb, qh_ = (lambda g: g), (lambda g: 0)
        kb, kh_ = (lambda g: g // kvg), (lambda g: 0)
    else:
        q3, k3, v3, do3, o3 = q, k, v, do, o
        qb, qh_ = (lambda g: g // h), (lambda g: g % h)
        kb, kh_ = (lambda g: g // h), (lambda g: (g % h) // kvg)

    grid_banded = banded == "band" and window is not None and causal
    tri_q = tri_k = None
    if banded == "tri" and causal and window is None:
        # triangular grids (see _flash_fwd), one per kernel: q-major
        # for dQ, k-major for dK/dV — zero idle grid steps each.
        r = bk // bq
        tri_q = _tri_counts_fwd(nq, r)
        tri_k = _tri_counts_dkv(nq, nk, r)
    spec_q = pl.BlockSpec((1, bq, d), lambda g, i, j: (qb(g), i, qh_(g)))
    if tri_q is not None:
        row = lambda t: _tri_unrank(t, tri_q)[0]
        loc = lambda t: _tri_unrank(t, tri_q)[1]
        spec_q = pl.BlockSpec((1, bq, d),
                              lambda g, i, t: (qb(g), row(t), qh_(g)))
        spec_k = pl.BlockSpec((1, bk, d),
                              lambda g, i, t: (kb(g), loc(t), kh_(g)))
        kv_steps = sum(tri_q)
    elif grid_banded:
        kv_steps = min(_nkb(bq, bk, window), nk)
        kstart = functools.partial(_kv_band_start, bq=bq, bk=bk, nk=nk,
                                   window=window, steps=kv_steps)
        spec_k = pl.BlockSpec(
            (1, bk, d), lambda g, i, j: (kb(g), kstart(i) + j, kh_(g)))
    elif banded:
        kvmap = functools.partial(_kv_band, bq=bq, bk=bk, nk=nk,
                                  causal=causal, window=window)
        spec_k = pl.BlockSpec(
            (1, bk, d), lambda g, i, j: (kb(g), kvmap(i, j), kh_(g)))
        kv_steps = nk
    else:
        spec_k = pl.BlockSpec((1, bk, d),
                              lambda g, i, j: (kb(g), j, kh_(g)))
        kv_steps = nk
    if tri_q is not None:
        spec_r = pl.BlockSpec((1, 8, bq), lambda g, i, t: (g, 0, row(t)))
        dq_grid = (bh, 1, kv_steps)
        dq_out = [spec_q, spec_r]
    else:
        spec_r = pl.BlockSpec((1, 8, bq), lambda g, i, j: (g, 0, i))
        dq_grid = (bh, nq, kv_steps)
        dq_out = [
            pl.BlockSpec((1, bq, d), lambda g, i, j: (qb(g), i, qh_(g))),
            pl.BlockSpec((1, 8, bq), lambda g, i, j: (g, 0, i)),
        ]

    import os as _os
    # FUSED single-sweep backward (see _bwd_fused_kernel): causal
    # tri-grid, no window/segments, dQ accumulator fits VMEM.  One pass
    # computes all three grads — 5 MXU dots + 1 exp2 per tile pair vs
    # the split kernels' 7 + 2.  Default OFF: the r5 block sweep
    # (benchmarks/sweep_attn_fused.py, v5e) raced both in one process —
    # split 1400 µs vs fused 2012 µs at its best blocks at the gate
    # shape (B2 H8 S4096 D64).  The fused kernel's fewer dots lose to
    # the ~1.6 MB of resident dQ/δ scratch that starves the Mosaic
    # pipeliner; TAPER_ATTN_FUSED_BWD=1 opts back in.
    use_fused = (tri_q is not None and seg is None
                 and sq * d * 4 <= 4 * 1024 * 1024
                 and _os.environ.get("TAPER_ATTN_FUSED_BWD", "0") == "1")
    if use_fused:
        r = bk // bq
        tri_f = _tri_counts_dkv(nq, nk, r)
        kf = lambda t: _tri_unrank(t, tri_f)[0]
        qf = lambda t: (_tri_unrank(t, tri_f)[0] * r
                        + _tri_unrank(t, tri_f)[1])
        fq_spec = pl.BlockSpec((1, bq, d),
                               lambda g, i, t: (qb(g), qf(t), qh_(g)))
        fr_spec = pl.BlockSpec((1, 8, bq), lambda g, i, t: (g, 0, qf(t)))
        fk_in = pl.BlockSpec((1, bk, d),
                             lambda g, i, t: (kb(g), kf(t), kh_(g)))
        # dK/dV emit at q-head width (group-summed below under GQA), so
        # their output coordinates are the Q-side ones
        fk_out = pl.BlockSpec((1, bk, d),
                              lambda g, i, t: (qb(g), kf(t), qh_(g)))
        # dQ lives in scratch for the whole sweep; its HBM block is the
        # full row, flushed once at the g boundary
        fdq_out = pl.BlockSpec((1, sq, d),
                               lambda g, i, t: (qb(g), 0, qh_(g)))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale, bq=bq,
                              bk=bk, tri=tri_f,
                              lowp=_dot_bf16_default(), nq=nq),
            grid=(bh, 1, sum(tri_f)),
            in_specs=[fq_spec, fk_in, fk_in, fq_spec, fq_spec,
                      fr_spec, fr_spec],
            out_specs=[fdq_out, fk_out, fk_out],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (bh, sq, d) if heads is None else (b, sq, h * d),
                    q.dtype),
                jax.ShapeDtypeStruct(
                    (bh, sk, d) if heads is None else (b, sk, h * d),
                    k.dtype),
                jax.ShapeDtypeStruct(
                    (bh, sk, d) if heads is None else (b, sk, h * d),
                    v.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((nq, bq, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((nq, 8, bq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel",
                                     "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=10 * bh * sq * sk * d // 2,
                bytes_accessed=q.dtype.itemsize
                * (bh * 5 * sq + b * hkv * 2 * sk) * d,
                transcendentals=bh * sq * sk // 2),
            interpret=_backend.pallas_interpret_mode(),
        )(q3, k3, v3, o3, do3, lse, dl_in)
        if heads is not None:
            if kvg > 1:
                # lane order within H·D is [hkv][kvg][d] (q head
                # qh = kvh·kvg + gi), so the group axis is contiguous
                dk = dk.reshape(b, sk, hkv, kvg, d)\
                    .astype(jnp.float32).sum(3)\
                    .reshape(b, sk, hkv * d).astype(k.dtype)
                dv = dv.reshape(b, sk, hkv, kvg, d)\
                    .astype(jnp.float32).sum(3)\
                    .reshape(b, sk, hkv * d).astype(v.dtype)
            return dq, dk, dv
        if kvg > 1:
            dk = dk.reshape(b, hkv, kvg, sk, d).astype(jnp.float32)\
                .sum(2).astype(k.dtype)
            dv = dv.reshape(b, hkv, kvg, sk, d).astype(jnp.float32)\
                .sum(2).astype(v.dtype)
        else:
            dk = dk.reshape(b, hkv, sk, d)
            dv = dv.reshape(b, hkv, sk, d)
        return dq.reshape(b, h, sq, d), dk, dv

    # TAPER_ATTN_CHUNK=1: chunk-skip the masked side of diagonal tiles
    # (see _flash_fwd) — measured NEGATIVE, off by default.
    chunk = (bq if tri_q is not None and seg is None
             and _os.environ.get("TAPER_ATTN_CHUNK", "0") == "1" else None)
    dq_in_specs = [_SMEM_SPEC, spec_q, spec_k, spec_k, spec_q, spec_q,
                   spec_r, spec_r]
    dq_args = [off, q3, k3, v3, o3, do3, lse, dl_in]
    if seg is not None:
        dq_in_specs += [_seg_spec(spec_q, bq, h),
                        _seg_spec(spec_k, bk, hkv)]
        dq_args += [_seg8(seg, b, sq), _seg8(seg, b, sk)]
    dq, delta = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          window=window, bq=bq, bk=bk, nk=nk,
                          lowp=_dot_bf16_default(),
                          grid_banded=grid_banded, tri=tri_q, chunk=chunk,
                          has_seg=seg is not None),
        grid=dq_grid,
        in_specs=dq_in_specs,
        out_specs=dq_out,
        out_shape=[
            jax.ShapeDtypeStruct(
                (bh, sq, d) if heads is None else (b, sq, h * d),
                q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq * sk * d // (2 if causal else 1),
            bytes_accessed=q.dtype.itemsize
            * (bh * 3 * sq + b * hkv * 2 * sk) * d,
            transcendentals=bh * sq * sk),
        interpret=_backend.pallas_interpret_mode(),
    )(*dq_args)

    # dK/dV: grid transposed — KV block is the revisited output, Q inner.
    if tri_k is not None:
        krow = lambda t: _tri_unrank(t, tri_k)[0]
        qblk = lambda t: (_tri_unrank(t, tri_k)[0] * (bk // bq)
                          + _tri_unrank(t, tri_k)[1])
        spec_q_t = pl.BlockSpec((1, bq, d),
                                lambda g, j, t: (qb(g), qblk(t), qh_(g)))
        spec_r_t = pl.BlockSpec((1, 8, bq), lambda g, j, t: (g, 0, qblk(t)))
        q_steps = sum(tri_k)
    elif grid_banded:
        q_steps = min((bk + window - 2) // bq + 2, nq)
        qstart = functools.partial(_q_band_start, bq=bq, bk=bk, nq=nq,
                                   steps=q_steps)
        spec_q_t = pl.BlockSpec(
            (1, bq, d), lambda g, j, i: (qb(g), qstart(j) + i, qh_(g)))
        spec_r_t = pl.BlockSpec((1, 8, bq),
                                lambda g, j, i: (g, 0, qstart(j) + i))
    elif banded:
        qmap = functools.partial(_q_band, bq=bq, bk=bk, nq=nq,
                                 causal=causal, window=window)
        spec_q_t = pl.BlockSpec(
            (1, bq, d), lambda g, j, i: (qb(g), qmap(j, i), qh_(g)))
        spec_r_t = pl.BlockSpec((1, 8, bq),
                                lambda g, j, i: (g, 0, qmap(j, i)))
        q_steps = nq
    else:
        spec_q_t = pl.BlockSpec((1, bq, d),
                                lambda g, j, i: (qb(g), i, qh_(g)))
        spec_r_t = pl.BlockSpec((1, 8, bq), lambda g, j, i: (g, 0, i))
        q_steps = nq
    if tri_k is not None:
        # dK/dV out at q-head width → Q-side coordinates (see fk_out)
        spec_k_t = pl.BlockSpec((1, bk, d),
                                lambda g, j, t: (qb(g), krow(t), qh_(g)))
        spec_k_in = pl.BlockSpec((1, bk, d),
                                 lambda g, j, t: (kb(g), krow(t), kh_(g)))
        dkv_grid = (bh, 1, q_steps)
    else:
        spec_k_t = pl.BlockSpec((1, bk, d),
                                lambda g, j, i: (qb(g), j, qh_(g)))
        spec_k_in = pl.BlockSpec((1, bk, d),
                                 lambda g, j, i: (kb(g), j, kh_(g)))
        dkv_grid = (bh, nk, q_steps)
    # the transposed experiment kernel has no triangular-grid or
    # segment support
    dkv = (_dkv_kernel_t if _os.environ.get("TAPER_ATTN_DKV_T") == "1"
           and tri_k is None and seg is None else _dkv_kernel)
    dkv_kwargs = ({} if dkv is _dkv_kernel_t
                  else {"tri": tri_k, "chunk": chunk,
                        "has_seg": seg is not None})
    dkv_in_specs = [_SMEM_SPEC, spec_q_t, spec_k_in, spec_k_in, spec_q_t,
                    spec_r_t, spec_r_t]
    dkv_args = [off, q3, k3, v3, do3, lse, delta]
    if seg is not None:
        dkv_in_specs += [_seg_spec(spec_q_t, bq, h),
                         _seg_spec(spec_k_in, bk, hkv)]
        dkv_args += [_seg8(seg, b, sq), _seg8(seg, b, sk)]
    dk, dv = pl.pallas_call(
        functools.partial(dkv, scale=scale, causal=causal,
                          window=window, bq=bq, bk=bk, nq=nq,
                          lowp=_dot_bf16_default(),
                          grid_banded=grid_banded, **dkv_kwargs),
        grid=dkv_grid,
        in_specs=dkv_in_specs,
        out_specs=[spec_k_t, spec_k_t],
        out_shape=[
            jax.ShapeDtypeStruct(
                (bh, sk, d) if heads is None else (b, sk, h * d),
                k.dtype),
            jax.ShapeDtypeStruct(
                (bh, sk, d) if heads is None else (b, sk, h * d),
                v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq * sk * d // (2 if causal else 1),
            bytes_accessed=q.dtype.itemsize
            * (bh * (2 * sq + 2 * sk) + b * hkv * 2 * sk) * d,
            transcendentals=bh * sq * sk),
        interpret=_backend.pallas_interpret_mode(),
    )(*dkv_args)

    if heads is not None:
        if kvg > 1:
            dk = dk.reshape(b, sk, hkv, kvg, d).astype(jnp.float32)\
                .sum(3).reshape(b, sk, hkv * d).astype(k.dtype)
            dv = dv.reshape(b, sk, hkv, kvg, d).astype(jnp.float32)\
                .sum(3).reshape(b, sk, hkv * d).astype(v.dtype)
        return dq, dk, dv
    if kvg > 1:
        # group-sum the per-q-head dK/dV partials (f32 accumulation —
        # cheaper error than chaining kvg−1 bf16 adds)
        dk = dk.reshape(b, hkv, kvg, sk, d).astype(jnp.float32).sum(2)
        dv = dv.reshape(b, hkv, kvg, sk, d).astype(jnp.float32).sum(2)
        dk = dk.astype(k.dtype)
        dv = dv.astype(v.dtype)
    shp = (b, h, sq, d)
    return (dq.reshape(shp), dk.reshape(b, hkv, sk, d),
            dv.reshape(b, hkv, sk, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, off, causal, scale, window, banded):
    o, _ = _flash_fwd(q, k, v, off, causal, scale, window, banded)
    return o


def _flash_vjp_fwd(q, k, v, off, causal, scale, window, banded):
    o, lse = _flash_fwd(q, k, v, off, causal, scale, window, banded)
    return o, (q, k, v, off, o, lse)


def _flash_vjp_bwd(causal, scale, window, banded, res, do):
    q, k, v, off, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, off, o, lse, do, causal, scale,
                                 window=window, banded=banded)
    return dq, dk, dv, jnp.zeros_like(off)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bshd(q, k, v, heads, causal, scale, banded):
    o, _ = _flash_fwd(q, k, v, _off_pair(None, None), causal, scale,
                      None, banded, heads=heads)
    return o


def _flash_bshd_vjp_fwd(q, k, v, heads, causal, scale, banded):
    o, lse = _flash_fwd(q, k, v, _off_pair(None, None), causal, scale,
                        None, banded, heads=heads)
    return o, (q, k, v, o, lse)


def _flash_bshd_vjp_bwd(heads, causal, scale, banded, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, _off_pair(None, None), o, lse,
                                 do, causal, scale, banded=banded,
                                 heads=heads)
    return dq, dk, dv


_flash_bshd.defvjp(_flash_bshd_vjp_fwd, _flash_bshd_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_seg(q, k, v, seg, causal, scale, window, banded):
    """Packed-sequence (segment-masked) flash attention — a separate
    custom_vjp so the segment-free hot path stays untouched.  Offsets
    are statically zero (packing is a whole-sequence training mode, not
    an SP/ring shard)."""
    o, _ = _flash_fwd(q, k, v, _off_pair(None, None), causal, scale, window, banded,
                      seg=seg)
    return o


def _flash_seg_vjp_fwd(q, k, v, seg, causal, scale, window, banded):
    o, lse = _flash_fwd(q, k, v, _off_pair(None, None), causal, scale, window,
                        banded, seg=seg)
    return o, (q, k, v, seg, o, lse)


def _flash_seg_vjp_bwd(causal, scale, window, banded, res, do):
    q, k, v, seg, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, _off_pair(None, None), o, lse, do, causal,
                                 scale, window=window, banded=banded,
                                 seg=seg)
    return dq, dk, dv, jnp.zeros_like(seg)


_flash_seg.defvjp(_flash_seg_vjp_fwd, _flash_seg_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_lse(q, k, v, off, causal, scale, window):
    o, lse = _flash_fwd(q, k, v, off, causal, scale, window)
    return o, lse[:, 0, :]              # drop the sublane replication


def _flash_lse_vjp_fwd(q, k, v, off, causal, scale, window):
    o, lse = _flash_fwd(q, k, v, off, causal, scale, window)
    return (o, lse[:, 0, :]), (q, k, v, off, o, lse)


def _flash_lse_vjp_bwd(causal, scale, window, res, cts):
    do, dlse = cts
    q, k, v, off, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, off, o, lse, do, causal, scale,
                                 dlse=dlse, window=window)
    return dq, dk, dv, jnp.zeros_like(off)


_flash_lse.defvjp(_flash_lse_vjp_fwd, _flash_lse_vjp_bwd)


def _off_pair(q_offset, k_offset):
    z = jnp.zeros((), jnp.float32)
    qo = z if q_offset is None else jnp.asarray(q_offset, jnp.float32)
    ko = z if k_offset is None else jnp.asarray(k_offset, jnp.float32)
    return jnp.stack([qo.reshape(()), ko.reshape(())])


def flash_attention(q, k, v, causal=False, scale=None, q_offset=None,
                    k_offset=None, window=None, segment_ids=None):
    """Flash scaled-dot-product attention; ``q``: [B, H, S, D];
    ``k, v``: [B, Hkv, S, D] with H % Hkv == 0 (GQA/MQA read natively —
    the kernels' KV index maps share each compact head across its query
    group, so the repeated K/V are never materialized in HBM and the
    saved residuals stay at Hkv width).

    ``q_offset``/``k_offset`` (traced scalars ok) are the global
    positions of this Q shard's first row / K chunk's first column —
    used by sequence parallelism (all-gather: q_offset only) and ring
    attention (both).  Offsets must be multiples of 128 so causal block
    boundaries stay aligned.

    ``segment_ids`` [B, S] (packed-sequence training): rows attend only
    keys with the SAME id — multiple documents share one sequence with
    no cross-contamination.  Requires Sq == Sk and no offsets/window."""
    import os

    if scale is None:
        scale = q.shape[-1] ** -0.5
    if segment_ids is not None:
        assert q_offset is None and k_offset is None and window is None,\
            "segment_ids compose with plain (optionally causal) " \
            "attention only"
        assert q.shape[2] == k.shape[2], (q.shape, k.shape)
        banded = ("tri" if causal
                  and os.environ.get("TAPER_ATTN_GRID", "tri") == "tri"
                  else False)
        return _flash_seg(q, k, v, jnp.asarray(segment_ids, jnp.int32),
                          causal, scale, None, banded)
    # banded fetch schedules need statically-zero offsets (the band is
    # computed in index maps, which cannot see the runtime offsets).
    # Grid modes for the masked cases:
    #   "tri"  — triangular grid (causal, no window): the inner grid dim
    #            enumerates exactly the causal band's block pairs; zero
    #            idle steps.  Default for plain causal.
    #   "band" — fixed-width banded grid (causal + window).
    #   True   — full sweep with clipped fetches (non-causal window).
    #   ``TAPER_ATTN_GRID=full`` forces the clipped-fetch sweep (the
    #   pre-triangular causal schedule) for A/B racing.
    banded = False
    if q_offset is None and k_offset is None:
        if causal and window is None:
            banded = ("tri" if os.environ.get("TAPER_ATTN_GRID", "tri")
                      == "tri" else True)
        elif causal and window is not None:
            banded = "band"
        elif window is not None:
            banded = True
    return _flash(q, k, v, _off_pair(q_offset, k_offset), causal, scale,
                  window, banded)


def flash_attention_bshd(q, k, v, num_heads, causal=False, scale=None):
    """Transpose-free flash attention in the PROJECTION layout:
    ``q`` [B, S, H·D], ``k``/``v`` [B, S, Hkv·D] (H % Hkv == 0), output
    [B, S, H·D].  Numerically identical to :func:`flash_attention` on
    the transposed inputs — the same kernel bodies run with index maps
    that slice head ``g % H`` out of the fused lane dimension, so the
    [B,S,HD] ↔ [B,H,S,D] relayout copies around every attention call
    (the largest non-matmul item in the 170M train-step budget,
    benchmarks/probe_mfu_budget.py) never happen.

    Requires D % 128 == 0 (head slices must be lane-tile-aligned; the
    module layer falls back to the transposed path otherwise) and
    lane-aligned S.  Windows/offsets/segment-ids: use
    :func:`flash_attention`."""
    import os

    d = q.shape[-1] // num_heads
    assert d % 128 == 0, (
        f"flash_attention_bshd needs head_dim % 128 == 0 (lane-aligned "
        f"head slices); got D={d} — use flash_attention")
    if scale is None:
        scale = d ** -0.5
    banded = False
    if causal:
        banded = ("tri" if os.environ.get("TAPER_ATTN_GRID", "tri")
                  == "tri" else True)
    return _flash_bshd(q, k, v, num_heads, causal, scale, banded)


def flash_attention_lse(q, k, v, causal=False, scale=None, q_offset=None,
                        k_offset=None, window=None):
    """Like :func:`flash_attention` but also returns the per-row
    logsumexp ``[B·H, Sq]`` (differentiable) — the merge statistic for
    combining partial attentions over K/V chunks (ring attention):
    given chunk results (o_i, lse_i), the total is
    ``Σ o_i·exp(lse_i − logsumexp_i lse_i)``.  Rows whose chunk is fully
    masked return o = 0, lse = −inf and drop out of the merge."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_lse(q, k, v, _off_pair(q_offset, k_offset), causal,
                      scale, window)


def attention(q, k, v, *, causal=False, scale=None, window=None,
              segment_ids=None):
    """Backend entry: flash kernel when shapes qualify, XLA oracle
    otherwise.  K/V may carry fewer heads than Q (GQA/MQA,
    H % Hkv == 0): the flash kernels read the compact heads natively;
    the oracle broadcasts them.  ``window=W`` bounds how far BACK a row attends (blocks
    fully behind the window are skipped, so compute scales O(S·W)
    instead of O(S²)); combine with ``causal=True`` for the usual
    sliding-window "last W positions" semantics — without causal, future
    positions remain visible (both backends agree).  ``segment_ids``
    [B, S] masks attention to same-segment keys (packed sequences);
    requires Sq == Sk and excludes ``window``.

    Requirements: lane-aligned sequences (multiples of 128), Sq == Sk for
    causal.  Measured dispatch threshold (benchmarks/bench_attention.py,
    v5e): below S≈1024 the S×S score matrix fits XLA's fusion footprint
    and its attention wins (S=512 causal: 21–26 µs vs flash's 49–54 µs);
    from S=1024 up flash wins everywhere, up to 15.9× at S=4096 bf16.
    ``TAPER_FLASH_MIN`` overrides the crossover (read at trace time)."""
    import os

    sq, sk = q.shape[2], k.shape[2]
    min_sk = int(os.environ.get("TAPER_FLASH_MIN", "1024"))
    ok = (sq % 128 == 0 and sk % 128 == 0
          and (not causal or sq == sk)
          # the oracle bottom-aligns windowed rows when sq != sk; the
          # kernel uses absolute positions — only equal lengths agree
          and (window is None or sq == sk)
          and (segment_ids is None or (sq == sk and window is None))
          and sk >= min_sk)
    if not ok:
        from taper_tpu.ops import xla as _xla
        return _xla.attention(q, k, v, causal=causal, scale=scale,
                              window=window, segment_ids=segment_ids)
    return flash_attention(q, k, v, causal, scale, window=window,
                           segment_ids=segment_ids)
