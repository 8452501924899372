"""Paged KV-cache decode attention (block pool + block tables).

Beyond-reference scope (the reference has no serving stack at all —
SURVEY.md §5.7/§5.8): vLLM-style paged KV caching, built the TPU way.

Why paging: the slot-based serving engine reserves ``max_seq`` cache
rows per slot, so cache memory is ``slots × max_seq`` even when most
requests are short.  A paged cache allocates fixed-size BLOCKS
(``block_size`` positions each) from a shared pool on demand; per-slot
memory is proportional to the tokens actually held, and the pool can be
oversubscribed relative to ``slots × max_seq`` (admission control
guarantees in-flight requests always fit).

Layouts (per layer):
  * pools  ``k/v: [n_blocks, kvh, block_size, D]`` — one DMA-able tile
    per (block, head).
  * table  ``[B, max_blocks] int32`` — slot b's logical block j lives in
    pool block ``table[b, j]``.  Entries past the allocated prefix are
    ignored (the kernel clamps, the oracle masks).
  * lengths ``[B] int32`` — valid positions per slot (≥ 1 at decode:
    the current token is written before attending, same invariant as
    the contiguous-cache engine).

Two implementations, equality-tested against each other:
  * ``impl="xla"`` — gather the table's blocks (``jnp.take``) into a
    contiguous view and run masked attention.  Correct everywhere, but
    the gather MATERIALIZES the blocks in HBM: the decode step pays
    read + write + read instead of one read.
  * ``impl="pallas"`` (default) — flash-decode kernel with the block
    table as a SCALAR-PREFETCHED operand: the index map DMAs pool block
    ``table[b, j]`` straight HBM→VMEM, so gathered bytes are read
    exactly once and nothing is materialized.  Blocks past the
    sequence length clamp to the last valid block — Pallas elides the
    re-fetch of an unchanged block index, so short sequences skip most
    of the DMA traffic too (and ``pl.when`` skips their compute).

Decode is HBM-bound; measured on v5e (16 slots × 8 kvh × G4 × D128,
bs=128, 4K max tokens, bf16): kernel 251 µs vs XLA gather 359 on mixed
256/4096 lengths (**1.43×** — the length-clamped DMA skip), 370 vs 367
when every slot is at max length (parity — XLA's gather+attend fusion
is already at roofline there; the kernel's remaining per-grid-step cost
eats what the removed materialization saves).  Grid-shape tuning
history in :func:`_make_paged_kernel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend
from taper_tpu.ops.pallas.attention import _dot_bf16_default, _dot_in

_NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Pool writes (XLA scatters — one row per slot per step; distinct slots
# own distinct blocks, so batched index updates never collide)
# ---------------------------------------------------------------------------

def paged_write(k_pool, v_pool, k, v, tables, pos):
    """Write one decode-step row per slot into the pools.

    ``k``/``v``: [B, kvh, 1, D] new rows; ``pos``: [B] absolute write
    positions; slot b's row lands in pool block ``tables[b, pos//bs]``
    at offset ``pos % bs``.  Returns the updated pools."""
    bs = k_pool.shape[2]
    blk = jnp.take_along_axis(tables, (pos[:, None] // bs), axis=1)[:, 0]
    off = pos % bs
    k_pool = k_pool.at[blk, :, off].set(k[:, :, 0, :].astype(k_pool.dtype))
    v_pool = v_pool.at[blk, :, off].set(v[:, :, 0, :].astype(v_pool.dtype))
    return k_pool, v_pool


def paged_write_scale(scale_pool, scale, tables, pos):
    """Scatter one per-position quantization scale per slot into a
    scale pool [n_blocks, kvh, bs] (int8 pools; the row itself goes
    through :func:`paged_write`).  ``scale``: [B, kvh]."""
    bs = scale_pool.shape[2]
    blk = jnp.take_along_axis(tables, (pos[:, None] // bs), axis=1)[:, 0]
    off = pos % bs
    return scale_pool.at[blk, :, off].set(scale.astype(scale_pool.dtype))


def paged_write_prefill_scale(scale_pool, scale, table_row):
    """Prefill counterpart of :func:`paged_write_scale`:
    ``scale`` [kvh, P] scattered block-wise into ``table_row``'s
    blocks."""
    kvh, p = scale.shape
    bs = scale_pool.shape[2]
    nb = -(-p // bs)
    pad = nb * bs - p
    if pad:
        scale = jnp.pad(scale, ((0, 0), (0, pad)))
    sb = scale.reshape(kvh, nb, bs).transpose(1, 0, 2)
    return scale_pool.at[table_row[:nb]].set(sb.astype(scale_pool.dtype))


def paged_write_prefill(k_pool, v_pool, k, v, table_row):
    """Scatter ONE sequence's prefill rows into its allocated blocks.

    ``k``/``v``: [kvh, P, D] (P ≤ len(table_row)·bs); rows are reshaped
    into ceil(P/bs) blocks and written with one scatter per pool.  The
    tail of the last block holds padding — masked by ``lengths`` at
    read time and overwritten by subsequent decode steps."""
    kvh, p, d = k.shape
    bs = k_pool.shape[2]
    nb = -(-p // bs)
    pad = nb * bs - p
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    # [kvh, nb·bs, D] -> [nb, kvh, bs, D]
    kb = k.reshape(kvh, nb, bs, d).transpose(1, 0, 2, 3)
    vb = v.reshape(kvh, nb, bs, d).transpose(1, 0, 2, 3)
    ids = table_row[:nb]
    return (k_pool.at[ids].set(kb.astype(k_pool.dtype)),
            v_pool.at[ids].set(vb.astype(v_pool.dtype)))


# ---------------------------------------------------------------------------
# Decode attention
# ---------------------------------------------------------------------------

def _xla_paged(q, k_pool, v_pool, tables, lengths, scale,
               k_scales=None, v_scales=None):
    """Gather-then-attend oracle (materializes the gathered blocks).
    int8 pools pass per-(block, head, position) ``k_scales``/
    ``v_scales`` [n_blocks, kvh, bs]."""
    b, mb = tables.shape
    kvh, bs, d = k_pool.shape[1:]

    def gather(pool):
        g = jnp.take(pool, tables, axis=0)       # [B, mb, kvh, bs, ...]
        g = jnp.moveaxis(g, 2, 1)
        return g.reshape((b, kvh, mb * bs) + pool.shape[3:])

    kg, vg = gather(k_pool).astype(jnp.float32), \
        gather(v_pool).astype(jnp.float32)
    if k_scales is not None:
        kg = kg * gather(k_scales)[..., None]
        vg = vg * gather(v_scales)[..., None]
    s = jnp.einsum("bhgd,bhkd->bhgk", q.astype(jnp.float32), kg,
                   preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(mb * bs)[None, :] < lengths[:, None]   # [B, S]
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", p, vg,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def _make_paged_kernel(nsub, bs, scale, lowp, quant=False):
    """Kernel over grid (B, mb/nsub): each step streams ``nsub`` pool
    blocks — ALL kv heads each — through one online-softmax scratch.

    Tuning history (v5e, 16 slots × 8 kvh × G4 × D128, bs=128, 4K max
    tokens, bf16, /tmp paged races): a (B, kvh, mb) per-head grid ran
    4–5× SLOWER than the XLA gather (32 KB DMAs can't amortize the
    ~1 µs per-grid-step cost); folding kv heads into the block (256 KB
    DMAs) beat XLA on mixed lengths; nsub=4 blocks per step (1 MB of
    K/V per step) also reaches parity on the all-long worst case:
    mixed 251 µs vs XLA 359 (1.43×), all-long 370 vs 367."""
    per = 4 if quant else 2      # refs per sub-block: k, v [, ks, vs]

    def kernel(tables_ref, lengths_ref, q_ref, *rest):
        kv_refs = rest[:per * nsub]
        o_ref = rest[per * nsub]
        m_sc, l_sc, acc_sc = rest[per * nsub + 1:]
        b = pl.program_id(0)
        j = pl.program_id(1)
        length = lengths_ref[b]

        @pl.when(j == 0)
        def _init():
            m_sc[:] = jnp.full_like(m_sc, _NEG_INF)
            l_sc[:] = jnp.zeros_like(l_sc)
            acc_sc[:] = jnp.zeros_like(acc_sc)

        def sub(k_ref, v_ref, ks_ref, vs_ref, col0):
            qt = _dot_in(q_ref[0], lowp)               # [kvh, G, D]
            kt = k_ref[0]                              # [kvh, bs, D]
            # int8 pools: dot on the raw int8 rows cast to the compute
            # dtype; the per-position k scale folds into the SCORES
            # after the dot, the v scale into the softmax weights
            # before theirs — same math as the contiguous quantized
            # cache (_decode_attention).
            kt = kt.astype(qt.dtype) if quant else _dot_in(kt, lowp)
            s = jax.lax.dot_general(                   # [kvh, G, bs]
                qt, kt, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            if quant:
                s = s * ks_ref[0][:, None, :]
            cols = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(cols < length, s, _NEG_INF)
            m_prev = m_sc[:, :, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            # a sub-block can be fully masked only at length==0
            # (excluded by contract), but keep the finite stand-in
            # anyway — same guard as the flash kernels.
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(s - m_safe)
            corr = jnp.exp(m_prev - m_safe)
            l_sc[:] = jnp.broadcast_to(
                l_sc[:, :, :1] * corr
                + jnp.sum(p, axis=2, keepdims=True), l_sc.shape)
            m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
            vt = v_ref[0]                              # [kvh, bs, D]
            if quant:
                p = p * vs_ref[0][:, None, :]
                vt = vt.astype(qt.dtype)
            else:
                vt = _dot_in(vt, lowp)
            pv = jax.lax.dot_general(                  # [kvh, G, D]
                p.astype(vt.dtype), vt, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc_sc[:] = acc_sc[:] * corr + pv

        for w in range(nsub):
            @pl.when((nsub * j + w) * bs < length)
            def _(w=w):
                r = kv_refs[per * w:per * (w + 1)]
                sub(r[0], r[1], r[2] if quant else None,
                    r[3] if quant else None, (nsub * j + w) * bs)

        @pl.when(j == pl.num_programs(1) - 1)
        def _fin():
            o_ref[0] = (acc_sc[:] / l_sc[:, :, :1]).astype(o_ref.dtype)

    return kernel


def _pallas_paged(q, k_pool, v_pool, tables, lengths, scale, nsub=4,
                  k_scales=None, v_scales=None):
    b, kvh, g, d = q.shape
    mb = tables.shape[1]
    bs = k_pool.shape[2]
    # clamp to 8: nsub=16 wedges the Mosaic compile in this
    # environment (HTTP 500, benchmarks/sweep_paged.py r5), and the
    # sweep shows nothing past 8 ever wins (nsub=4 is the mixed-profile
    # optimum at the 53%-active-bytes roofline — docs/SERVING.md)
    nsub = max(1, min(nsub, mb, 8))
    quant = k_scales is not None
    # pad the (tiny) query-group dim up to a full sublane tile
    gp = max(8, -(-g // 8) * 8)
    if gp != g:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    pad = (-mb) % nsub
    if pad:        # repeat the last column; clamped/masked like any
        tables = jnp.concatenate([tables] + [tables[:, -1:]] * pad,
                                 axis=1)
        mb += pad
    tables = tables.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def q_idx(bi, j, tables, lengths):
        return (bi, 0, 0, 0)

    def kv_idx(which, rank4=True):
        def f(bi, j, tables, lengths):
            # clamp past-the-end steps to the last valid block: Pallas
            # skips the DMA when the block index is unchanged, so short
            # sequences stream only their own blocks.
            nb = jnp.maximum((lengths[bi] + bs - 1) // bs, 1)
            jc = jnp.minimum(nsub * j + which, nb - 1)
            return ((tables[bi, jc], 0, 0, 0) if rank4
                    else (tables[bi, jc], 0, 0))
        return f

    in_specs = [pl.BlockSpec((1, kvh, gp, d), q_idx)]
    per_args = []
    for w in range(nsub):
        in_specs += [pl.BlockSpec((1, kvh, bs, d), kv_idx(w))] * 2
        per_args += [k_pool, v_pool]
        if quant:
            in_specs += [pl.BlockSpec((1, kvh, bs),
                                      kv_idx(w, rank4=False))] * 2
            per_args += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, mb // nsub),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, gp, d), q_idx),
        scratch_shapes=[
            pltpu.VMEM((kvh, gp, 128), jnp.float32),
            pltpu.VMEM((kvh, gp, 128), jnp.float32),
            pltpu.VMEM((kvh, gp, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _make_paged_kernel(nsub, bs, scale, _dot_bf16_default(),
                           quant=quant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, gp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kvh * gp * mb * bs * d,
            bytes_accessed=(2 * k_pool.dtype.itemsize * b * kvh * mb
                            * bs * d),
            transcendentals=b * kvh * gp * mb * bs),
        interpret=_backend.pallas_interpret_mode(),
    )(tables, lengths, q, *per_args)
    return out[:, :, :g] if gp != g else out


def paged_decode_attention(q, k_pool, v_pool, tables, lengths, *,
                           scale, impl=None, nsub=4,
                           k_scales=None, v_scales=None):
    """Decode attention against a paged KV cache.

    ``q``: [B, kvh, G, D] (G = query heads per KV head — GQA folds its
    groups here, MHA passes G=1); pools [n_blocks, kvh, bs, D]; see
    module docstring for ``tables``/``lengths``.  Every ``lengths[b]``
    must be ≥ 1.  ``nsub``: pool blocks streamed per kernel grid step
    (clamped to the table width).  int8 pools pass ``k_scales``/
    ``v_scales`` [n_blocks, kvh, bs] (one symmetric scale per stored
    position — the paged form of the quantized contiguous cache).
    Returns [B, kvh, G, D] in ``q.dtype``."""
    assert q.ndim == 4 and k_pool.ndim == 4, (q.shape, k_pool.shape)
    assert k_pool.shape == v_pool.shape
    assert q.shape[1] == k_pool.shape[1], (q.shape, k_pool.shape)
    assert q.shape[3] == k_pool.shape[3], (q.shape, k_pool.shape)
    assert (k_scales is None) == (v_scales is None)
    if impl is None:
        impl = "pallas"
    if impl == "xla":
        return _xla_paged(q, k_pool, v_pool, tables, lengths, scale,
                          k_scales, v_scales)
    return _pallas_paged(q, k_pool, v_pool, tables, lengths, scale,
                         nsub=nsub, k_scales=k_scales,
                         v_scales=v_scales)
