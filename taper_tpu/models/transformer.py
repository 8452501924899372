"""Decoder-only transformer LM (beyond-reference model family).

The reference's model zoo stops at MLP/CNN (SURVEY.md §2.11); this adds
the architecture TPUs are actually sized for.  GPT-2-style: learned token
+ position embeddings, pre-LN blocks, final LayerNorm, tied or untied LM
head.  Residual-output projections are scaled by ``1/sqrt(2·depth)`` so
activations stay O(1) at init regardless of depth.

``compute_dtype=jnp.bfloat16`` runs the trunk in bf16 (single-pass MXU)
while keeping params, LayerNorm statistics, the flash-attention softmax
and the logits in f32 — the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from taper_tpu.nn.module import Module
from taper_tpu.nn.transformer import Embedding, LayerNorm, TransformerBlock


def _filter_logits(logits, temperature, top_k=None, top_p=None):
    """Temperature-scaled, top-k/top-p-masked logits (the distribution
    every sampling path — plain and speculative — draws from; both
    sides of speculative verification must apply the IDENTICAL
    transform).  ``top_k`` keeps the k highest-logit tokens; ``top_p``
    keeps the smallest set whose probability mass reaches p (nucleus
    sampling; the argmax token is always kept).  Both filters are
    static-shape mask-to-−inf transforms, jit/scan-safe."""
    logits = logits / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        v = logits.shape[-1]
        idx = jnp.argsort(-logits, axis=-1)
        sl = jnp.take_along_axis(logits, idx, -1)
        probs = jax.nn.softmax(sl, axis=-1)
        # exclusive prefix mass < p keeps the token; forcing column 0
        # keeps the argmax even at top_p <= 0 (otherwise every token
        # masks to -inf and categorical degenerates to token id 0)
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        keep = keep.at[..., 0].set(True)
        sl = jnp.where(keep, sl, -jnp.inf)
        # O(V) inverse permutation via scatter (a second argsort would
        # be a full extra sort on the per-token decode hot path)
        arange = jnp.broadcast_to(jnp.arange(v), idx.shape)
        inv = jnp.put_along_axis(jnp.zeros_like(idx), idx, arange,
                                 axis=-1, inplace=False)
        logits = jnp.take_along_axis(sl, inv, -1)
    return logits


def _sample(logits, key, *, temperature=0.0, top_k=None, top_p=None):
    """Next-token sampling shared by every generate path (greedy at
    ``temperature == 0``).  Returns ``(next_tokens int32, key)``."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), key
    logits = _filter_logits(logits, temperature, top_k, top_p)
    key, sk = jax.random.split(key)
    return jax.random.categorical(sk, logits).astype(jnp.int32), key


def _mask_after_eos(tokens, starts, eos, pad):
    """Replace every token strictly after each row's first ``eos`` (in
    its generated region, positions >= ``starts``; [B] vector or
    scalar) with ``pad``.  Static-shape post-pass shared by all
    generate paths."""
    b, s = tokens.shape
    idx = jnp.arange(s)[None, :]
    starts = jnp.broadcast_to(jnp.asarray(starts), (b,))[:, None]
    hit = (tokens == eos) & (idx >= starts)
    after = (jnp.cumsum(hit.astype(jnp.int32), axis=1)
             - hit.astype(jnp.int32)) > 0
    return jnp.where(after & (idx >= starts), pad, tokens)


def _spec_accept(key, drafts, q, p):
    """One round of speculative SAMPLING verification (the
    rejection-sampling scheme of speculative decoding: accept draft
    token x with probability min(1, p(x)/q(x)); on rejection, resample
    from the residual ``norm(max(p − q, 0))`` — the emitted token is
    then EXACTLY distributed as p, the target distribution).

    ``drafts`` [B, γ] tokens sampled from ``q`` [B, γ, V]; ``p``
    [B, γ+1, V] target distributions at the same positions plus the
    bonus position.  Rows advance in lockstep at the minimum acceptance
    count (truncating an accepted prefix keeps it target-distributed —
    acceptance at position i depends only on randomness at ≤ i).

    Returns ``(n_acc scalar int32, nxt [B] int32, key)``: the globally
    accepted draft count and, per row, the token for position
    ``cur + n_acc`` — its accepted draft if it accepted further, else a
    residual sample (== a bonus sample from p[γ] when everything was
    accepted, since the residual of q=0 is p itself)."""
    b, g, v = q.shape
    key, ku, kr = jax.random.split(key, 3)
    qx = jnp.take_along_axis(q, drafts[..., None], -1)[..., 0]   # [B, γ]
    px = jnp.take_along_axis(p[:, :g], drafts[..., None], -1)[..., 0]
    u = jax.random.uniform(ku, (b, g))
    acc = u * qx < px            # u < p/q without the division (q>0 a.s.)
    n_acc_row = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1),
                        axis=1)                                  # [B]
    n_acc = jnp.min(n_acc_row)
    # residual at the first non-accepted position; q beyond γ-1 is 0
    # (no draft there), so n_acc == γ degrades to a plain p[γ] sample
    p_at = jnp.take(p, n_acc, axis=1)                            # [B, V]
    q_at = jnp.where(n_acc >= g, jnp.zeros_like(p_at),
                     jnp.take(q, jnp.minimum(n_acc, g - 1), axis=1))
    r = jnp.maximum(p_at - q_at, 0.0)
    rsum = jnp.sum(r, axis=-1, keepdims=True)
    r = jnp.where(rsum > 0, r / rsum, p_at)      # p==q ⇒ accept-prob 1,
    res = jax.random.categorical(                # fallback never biased
        kr, jnp.log(jnp.maximum(r, 1e-38))).astype(jnp.int32)
    kept_draft = jnp.take(drafts, jnp.minimum(n_acc, g - 1), axis=1)
    nxt = jnp.where(n_acc_row > n_acc, kept_draft, res)
    return n_acc, nxt, key


def _spec_accept_rows(key, drafts, q, p):
    """Per-row speculative sampling verification (see
    :func:`_spec_accept` for the scheme): each row keeps its OWN
    accepted count instead of truncating to the batch minimum, so a row
    with a good draft commits γ+1 tokens even when a neighbour rejects
    at 0.  The committed token at each row's ``cur + n_acc[b]`` is
    always the residual sample (per-row, the rejection happens exactly
    at ``n_acc[b]``; full acceptance degrades to a bonus sample from
    ``p[γ]`` since the residual of q = 0 is p itself).

    Returns ``(n_acc [B] int32, nxt [B] int32, key)``."""
    b, g, v = q.shape
    key, ku, kr = jax.random.split(key, 3)
    qx = jnp.take_along_axis(q, drafts[..., None], -1)[..., 0]
    px = jnp.take_along_axis(p[:, :g], drafts[..., None], -1)[..., 0]
    u = jax.random.uniform(ku, (b, g))
    acc = u * qx < px
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1),
                    axis=1)                                      # [B]
    p_at = jnp.take_along_axis(p, n_acc[:, None, None],
                               axis=1)[:, 0]                     # [B, V]
    q_at = jnp.take_along_axis(
        q, jnp.minimum(n_acc, g - 1)[:, None, None], axis=1)[:, 0]
    q_at = jnp.where((n_acc >= g)[:, None], jnp.zeros_like(q_at), q_at)
    r = jnp.maximum(p_at - q_at, 0.0)
    rsum = jnp.sum(r, axis=-1, keepdims=True)
    r = jnp.where(rsum > 0, r / rsum, p_at)
    nxt = jax.random.categorical(
        kr, jnp.log(jnp.maximum(r, 1e-38))).astype(jnp.int32)
    return n_acc, nxt, key


class TinyGPT(Module):
    """Causal LM over integer tokens ``[B, S] -> logits [B, S, vocab]``."""

    def __init__(self, vocab_size: int, dim: int = 128, depth: int = 2,
                 num_heads: int = 2, max_seq: int = 256,
                 mlp_ratio: int = 4, tied_head: bool = True,
                 dropout: float = 0.0, rope: bool = False,
                 num_kv_heads: Optional[int] = None,
                 n_experts: int = 0, top_k: int = 2,
                 capacity_factor: Optional[float] = None,
                 window: Optional[int] = None,
                 compute_dtype: Optional[jnp.dtype] = None,
                 remat: bool = False,
                 norm: str = "layer", mlp_act: str = "gelu"):
        self.vocab_size = vocab_size
        self.dim = dim
        self.depth = depth
        self.max_seq = max_seq
        self.tied_head = tied_head
        self.compute_dtype = compute_dtype
        # jax.checkpoint each block: activations are recomputed in the
        # backward instead of saved — peak memory drops from O(depth)
        # activation sets to O(1) at ~1.33x the flops (the standard TPU
        # HBM-for-MXU trade; enables deeper/longer configs per chip).
        self.remat = remat
        out_std = 0.02 / math.sqrt(2 * depth)
        self.tok = Embedding(vocab_size, dim)
        self.pos = Embedding(max_seq, dim)
        self.rope = rope
        self.blocks = [TransformerBlock(dim, num_heads, causal=True,
                                        mlp_ratio=mlp_ratio,
                                        dropout=dropout,
                                        out_init_std=out_std,
                                        rope=rope, max_seq=max_seq,
                                        num_kv_heads=num_kv_heads,
                                        n_experts=n_experts,
                                        top_k=top_k,
                                        capacity_factor=capacity_factor,
                                        window=window,
                                        norm=norm, mlp_act=mlp_act)
                       for _ in range(depth)]
        from taper_tpu.nn.transformer import RMSNorm
        self.ln_f = (RMSNorm if norm == "rms" else LayerNorm)(dim)

    def init(self, key):
        ks = jax.random.split(key, 3 + self.depth + (not self.tied_head))
        p = {"tok": self.tok.init(ks[0]), "pos": self.pos.init(ks[1]),
             "blocks": [blk.init(k)
                        for blk, k in zip(self.blocks, ks[2:2 + self.depth])],
             "ln_f": self.ln_f.init(ks[2 + self.depth])}
        if not self.tied_head:
            p["head"] = jax.random.normal(
                ks[-1], (self.vocab_size, self.dim), jnp.float32) * 0.02
        return p

    def hidden(self, params, tokens, *, train=False, rng=None,
               segment_ids=None, positions=None):
        """Trunk forward: final-LN'd activations ``[B, S, D]`` (f32).

        ``segment_ids``/``positions`` [B, S] enable PACKED-sequence
        training (see ``data/packing.py``): attention stays within each
        document and RoPE/positional indices restart per document."""
        b, s = tokens.shape
        assert s <= self.max_seq, (s, self.max_seq)
        x = self.tok.apply(params["tok"], tokens)
        if not self.rope:
            pos = (jnp.arange(s) if positions is None else positions)
            x = x + self.pos.apply(params["pos"], pos)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        rngs = (jax.random.split(rng, self.depth)
                if rng is not None else [None] * self.depth)
        for blk, bp, r in zip(self.blocks, params["blocks"], rngs):
            if self.remat:
                x = jax.checkpoint(
                    functools.partial(blk.apply, train=train, rng=r,
                                      segment_ids=segment_ids,
                                      positions=positions))(bp, x)
            else:
                x = blk.apply(bp, x, train=train, rng=r,
                              segment_ids=segment_ids,
                              positions=positions)
        return self.ln_f.apply(params["ln_f"], x).astype(jnp.float32)

    def apply(self, params, tokens, *, train=False, rng=None,
              segment_ids=None, positions=None):
        return self._logits(params, self.hidden(
            params, tokens, train=train, rng=rng,
            segment_ids=segment_ids, positions=positions))

    def _head_weights(self, params):
        """Tied or untied head ``[V, D]``; PTQ'd heads dequantize inside
        the jitted forward."""
        from taper_tpu.nn.transformer import _is_qt
        head = params["tok"]["w"] if self.tied_head else params["head"]
        if _is_qt(head):
            head = head.dequantize()
        return head

    def _logits(self, params, x):
        return jnp.einsum("bse,ve->bsv", x, self._head_weights(params))

    def loss(self, params, tokens, targets, mask, *, train=False,
             rng=None, chunk=None, segment_ids=None,
             positions=None, z_loss: float = 0.0):
        """Masked next-token loss WITHOUT materializing ``[B, S, V]``
        logits: the trunk's hidden states stream through
        :func:`losses.fused_linear_cross_entropy` in vocab chunks (both
        passes), so peak head memory is O(B·S·chunk) — the large-vocab
        training path.  Semantics match ``masked_token_loss(apply(...))``
        exactly (equality-tested); returns ``(loss, accuracy)``.
        ``segment_ids``/``positions``: packed-sequence training (the
        packer's loss mask already zeroes cross-document targets).

        Shape-aware dispatch (measured, benchmarks/probe_fused_ce.py):
        where the naive ``[N, V]`` logits fit comfortably (≲ 2^28
        elements — ~3 GB of transients in the backward) the naive path
        is 1.2–1.4× FASTER (the fused form recomputes per chunk, ~4 vs
        3 N·V·D matmuls), so it is used; the fused online-softmax path
        engages beyond that, where the naive backward's logit buffers
        would eat the chip (it trains at V=131072 where naive OOMs).
        ``chunk=None`` (default) auto-dispatches; an explicit ``chunk``
        forces the fused path with that vocab-chunk size; ``chunk=0``
        forces naive.

        ``z_loss > 0`` adds the PaLM-style logit regularizer
        ``z_loss · mean(logsumexp²)`` over masked positions (identical
        on both paths — the fused form differentiates through its saved
        online logsumexp, still never materializing ``[N, V]``).
        """
        from taper_tpu.losses import fused_linear_cross_entropy
        x = self.hidden(params, tokens, train=train, rng=rng,
                        segment_ids=segment_ids, positions=positions)
        b, s, d = x.shape
        naive = (chunk == 0 or
                 (chunk is None and b * s * self.vocab_size <= 2 ** 28))
        if naive:
            from taper_tpu.data.seq import masked_token_loss
            return masked_token_loss(self._logits(params, x), targets,
                                     mask, z_loss=z_loss)
        nll, pred, lse = fused_linear_cross_entropy(
            x.reshape(b * s, d), self._head_weights(params),
            targets.reshape(-1), chunk=chunk or 4096, return_lse=True)
        nll = nll.reshape(b, s)
        pred = pred.reshape(b, s)
        m = jnp.broadcast_to(mask, nll.shape)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss = jnp.sum(nll * m) / denom
        if z_loss:
            lse = lse.reshape(b, s)
            loss = loss + z_loss * jnp.sum(lse * lse * m) / denom
        acc = jnp.sum((pred == targets) * m) / denom
        return loss, acc

    # -- serving: KV-cache autoregressive decode ---------------------------

    def init_cache(self, batch: int, dtype=None, quantized: bool = False,
                   ring: bool = False):
        """``quantized=True``: int8 KV cache with per-(batch, head,
        position) scales — 4×/2× less decode-time HBM traffic than
        f32/bf16 caches (the dominant read at long context).

        ``ring=True`` (sliding-``window`` models only): W-slot ring
        buffers — cache memory and decode reads drop from O(max_seq) to
        O(W) per layer.  Supported by ``generate``/prefill/decode_step;
        ``decode_chunk`` (speculative verification) asserts it away."""
        from taper_tpu.nn.transformer import block_init_cache
        dt = dtype or self.compute_dtype or jnp.float32
        return [block_init_cache(blk, batch, self.max_seq, dt, quantized,
                                 ring=ring)
                for blk in self.blocks]

    def decode_step(self, params, tok_t, pos, caches):
        """One token per sequence: ``tok_t`` [B] int32 at position ``pos``
        (traced scalar, or a [B] vector for ragged serving — each row at
        its own position).  Returns ``(logits [B, vocab], new_caches)``."""
        from taper_tpu.nn.transformer import block_apply_decode
        x = self.tok.apply(params["tok"], tok_t[:, None])  # [B, 1, E]
        if not self.rope:
            pe = self.pos.apply(params["pos"], pos)
            x = x + (pe[:, None, :] if jnp.ndim(pos) == 1 else pe)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        new_caches = []
        for blk, bp, c in zip(self.blocks, params["blocks"], caches):
            x, c = block_apply_decode(blk, bp, x, c, pos)
            new_caches.append(c)
        x = self.ln_f.apply(params["ln_f"], x).astype(jnp.float32)
        return self._logits(params, x)[:, 0], new_caches

    def init_paged_cache(self, n_blocks: int, block_size: int = 128,
                         dtype=None, quantized: bool = False):
        """Per-layer PAGED pools: {"k","v": [n_blocks, kvh, bs, D]}
        (+ per-position "k_scale"/"v_scale" when ``quantized`` — the
        int8 cache's 2× byte saving composes with paging).  Block
        tables/lengths live OUTSIDE (the serving engine owns
        allocation); see ops/pallas/paged_attention.py."""
        from taper_tpu.nn.transformer import mha_init_paged_pool
        dt = dtype or self.compute_dtype or jnp.float32
        return [mha_init_paged_pool(blk.attn, n_blocks, block_size, dt,
                                    quantized=quantized)
                for blk in self.blocks]

    def decode_step_paged(self, params, tok_t, pos, pools, tables,
                          impl=None):
        """One token per slot against the paged cache: ``tok_t`` [B]
        int32, ``pos`` [B] per-row positions, ``tables`` [B, mb] block
        tables; ``impl`` selects the paged-attention implementation
        (None → the pallas kernel).  Returns
        ``(logits [B, vocab], new_pools)``."""
        from taper_tpu.nn.transformer import block_apply_decode_paged
        x = self.tok.apply(params["tok"], tok_t[:, None])  # [B, 1, E]
        if not self.rope:
            pe = self.pos.apply(params["pos"], pos)
            x = x + pe[:, None, :]
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        new_pools = []
        for blk, bp, pl in zip(self.blocks, params["blocks"], pools):
            x, pl = block_apply_decode_paged(blk, bp, x, pl, tables,
                                             pos, impl=impl)
            new_pools.append(pl)
        x = self.ln_f.apply(params["ln_f"], x).astype(jnp.float32)
        return self._logits(params, x)[:, 0], new_pools

    def prefill_paged(self, params, prompt, pools, tables):
        """Prefill ``prompt`` [B, P] through the normal one-dispatch
        flash prefill, then scatter each row's K/V into its table's
        pool blocks (ceil(P/bs) blocks per row — the engine allocates
        them; pad-position rows land in the last block's tail and are
        masked by ``lengths`` at read time).  Returns
        ``(logits [B, P, vocab], new_pools)``."""
        from taper_tpu.ops.pallas.paged_attention import (
            paged_write_prefill, paged_write_prefill_scale)
        b, p = prompt.shape
        quantized = "k_scale" in pools[0]
        tmp = [
            {k: (jnp.zeros((b,) + v.shape[1:2] + (p,) + v.shape[3:],
                           v.dtype) if k in ("k", "v") else
                 jnp.zeros((b,) + v.shape[1:2] + (p,), v.dtype))
             for k, v in c.items()}
            for c in self.init_cache(b, quantized=quantized)
        ]
        logits, tmp = self.prefill(params, prompt, tmp)
        new_pools = []
        for pool, c in zip(pools, tmp):
            new = dict(pool)
            for i in range(b):          # engine admissions are 1-row
                new["k"], new["v"] = paged_write_prefill(
                    new["k"], new["v"], c["k"][i], c["v"][i], tables[i])
                if quantized:
                    new["k_scale"] = paged_write_prefill_scale(
                        new["k_scale"], c["k_scale"][i], tables[i])
                    new["v_scale"] = paged_write_prefill_scale(
                        new["v_scale"], c["v_scale"][i], tables[i])
            new_pools.append(new)
        return logits, new_pools

    def prefill_paged_continued(self, params, toks, pools, tables,
                                past_len: int):
        """Chunk-prefill ``toks`` [B, C] at offset ``past_len`` (static
        int) against paged pools whose ``tables`` [B, mb] already hold
        the first ``past_len`` positions — e.g. a SHARED system-prompt
        prefix: many tables may alias the same prefix blocks, whose K/V
        is stored ONCE (the paged form of prefix caching).

        Each row's new K/V rows land in its own blocks.  Caller
        guarantees the blocks covering [past_len//bs, ...) are
        exclusively owned by that row — with ``past_len % block_size
        == 0`` the new range starts on a block boundary, so shared
        prefix blocks are never written (the serving engine enforces
        this).  Returns ``(logits [B, C, vocab], new_pools)``.

        Implementation: gather each table's blocks into a transient
        full-length contiguous cache (one admission-sized buffer — the
        same footprint the contiguous engine's admission pays), run the
        existing chunked-decode path, scatter the touched blocks back.
        """
        from taper_tpu.ops.pallas.paged_attention import (
            paged_write_prefill, paged_write_prefill_scale)
        b, c = toks.shape
        bs = pools[0]["k"].shape[2]
        quantized = "k_scale" in pools[0]
        nb_used = -(-(past_len + c) // bs)
        j0 = past_len // bs

        def gathered(arr):                   # pool -> [B, kvh, L, ...]
            g = jnp.take(arr, tables[:, :nb_used], axis=0)
            g = jnp.moveaxis(g, 2, 1)        # [B, kvh, nb, bs(, d)]
            flat = g.reshape((b, arr.shape[1], nb_used * bs)
                             + arr.shape[3:])
            pad = self.max_seq - nb_used * bs
            if pad > 0:
                width = [(0, 0), (0, 0), (0, pad)] + [(0, 0)] * (
                    flat.ndim - 3)
                flat = jnp.pad(flat, width)
            return flat

        tmp = [{k2: gathered(v2) for k2, v2 in pool.items()}
               for pool in pools]
        logits, tmp = self.decode_chunk(params, toks, past_len, tmp)
        new_pools = []
        for pool, cch in zip(pools, tmp):
            new = dict(pool)
            lo, hi = j0 * bs, nb_used * bs
            for i in range(b):               # admissions are 1-row
                row = tables[i, j0:nb_used]
                new["k"], new["v"] = paged_write_prefill(
                    new["k"], new["v"], cch["k"][i, :, lo:hi],
                    cch["v"][i, :, lo:hi], row)
                if quantized:
                    new["k_scale"] = paged_write_prefill_scale(
                        new["k_scale"], cch["k_scale"][i, :, lo:hi],
                        row)
                    new["v_scale"] = paged_write_prefill_scale(
                        new["v_scale"], cch["v_scale"][i, :, lo:hi],
                        row)
            new_pools.append(new)
        return logits, new_pools

    def decode_chunk(self, params, toks, pos, caches):
        """Multi-token cache-backed step: ``toks`` [B, C] at positions
        [pos, pos+C) (traced scalar ``pos``, or a [B] vector — per-row
        speculative verification: each row's chunk at its own start).
        Returns ``(logits [B, C, vocab], new_caches)``.  The
        speculative-decoding verifier: the target model scores a
        γ-token draft in one dispatch instead of γ sequential decode
        steps."""
        from taper_tpu.nn.transformer import block_apply_chunk
        b, c = toks.shape
        x = self.tok.apply(params["tok"], toks)
        if not self.rope:
            pp = (pos[:, None] if jnp.ndim(pos) == 1 else pos) \
                + jnp.arange(c)
            x = x + self.pos.apply(params["pos"], pp)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        new_caches = []
        for blk, bp, ca in zip(self.blocks, params["blocks"], caches):
            x, ca = block_apply_chunk(blk, bp, x, ca, pos)
            new_caches.append(ca)
        x = self.ln_f.apply(params["ln_f"], x).astype(jnp.float32)
        return self._logits(params, x), new_caches

    def prefill(self, params, prompt, caches):
        """Process the whole prompt ``[B, P]`` in ONE forward (full flash
        attention) and fill cache positions [0, P) of every layer in a
        single dispatch.  Returns ``(logits [B, P, vocab], new_caches)``
        — prompt processing at matmul rates, vs. P sequential decode
        steps at matvec rates."""
        from taper_tpu.nn.transformer import block_apply_prefill
        b, s = prompt.shape
        assert s <= self.max_seq, (s, self.max_seq)
        x = self.tok.apply(params["tok"], prompt)
        if not self.rope:
            x = x + self.pos.apply(params["pos"], jnp.arange(s))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        new_caches = []
        for blk, bp, c in zip(self.blocks, params["blocks"], caches):
            x, c = block_apply_prefill(blk, bp, x, c)
            new_caches.append(c)
        x = self.ln_f.apply(params["ln_f"], x).astype(jnp.float32)
        return self._logits(params, x), new_caches

    def generate(self, params, prompt, max_new: int,
                 temperature: float = 0.0, key=None,
                 one_shot_prefill: bool = True, prompt_lens=None,
                 top_k=None, top_p=None, quantized_cache: bool = False,
                 eos_token=None, pad_token=None,
                 return_cache: bool = False, ring_cache: bool = False):
        """Autoregressive generation with a static-shape KV cache.
        ``prompt``: [B, P] int32 (same length per batch row, unless
        ``prompt_lens`` makes it ragged).  Greedy when
        ``temperature == 0``.  Returns ``[B, P + max_new]`` tokens.

        Default path: :meth:`prefill` fills all P cache entries in one
        dispatch, then one ``lax.scan`` decodes the ``max_new`` new
        tokens.  ``one_shot_prefill=False`` keeps the token-at-a-time
        reference path (the equality oracle for tests).

        **Ragged batches**: ``prompt_lens`` [B] int32 (each ≥ 1) marks
        each row's true prompt length (rows RIGHT-padded to P with any
        token).
        Row r's generated tokens land at positions [L_r, L_r+max_new);
        positions beyond stay as given.  Prefill is shared (pad-position
        cache entries are overwritten by decode before any row can
        attend them, since row r's mask stops at its own position).
        Ragged batches always use one-shot prefill; the sequential
        oracle for them is running each row alone through the non-ragged
        ``one_shot_prefill=False`` path (what the tests do).

        **Early stopping**: ``eos_token`` set makes the decode loop a
        ``while_loop`` that EXITS as soon as every row has emitted eos
        (serving latency: a batch of short answers doesn't pay for
        ``max_new`` steps), and every token after a row's first eos is
        replaced by ``pad_token`` (default: the eos token itself).

        **Multi-turn serving**: ``return_cache=True`` returns
        ``(tokens, caches)`` — the filled KV cache (positions
        [0, P + max_new − 1); the LAST token was sampled but never fed)
        hands off to :meth:`generate_continued`, which appends a new
        prompt chunk without re-prefilling the shared prefix.
        ``max_new=0`` with ``return_cache=True`` is the prefill-only
        call: fills [0, P) and returns ``(prompt, caches)``.
        Incompatible with ``eos_token`` (an early exit leaves the cache
        filled only to the exit position, and post-eos cache rows hold
        the pre-masking sampled tokens — a silent mismatch with the
        pad-masked token output), so that combination raises."""
        if return_cache and eos_token is not None:
            raise ValueError(
                "return_cache with eos_token is not supported: early "
                "exit leaves the cache partially filled (and post-eos "
                "rows disagree with the pad-masked tokens); bound the "
                "turn with max_new instead")
        if max_new <= 0:
            if return_cache:
                caches = self.init_cache(prompt.shape[0],
                                         quantized=quantized_cache,
                                         ring=ring_cache)
                _, caches = self.prefill(params, prompt, caches)
                return prompt, caches
            return prompt
        if prompt_lens is not None:
            if not one_shot_prefill:
                raise ValueError(
                    "ragged generation (prompt_lens=...) always uses "
                    "one-shot prefill; for a sequential oracle run each "
                    "row separately with one_shot_prefill=False")
            if return_cache:
                raise ValueError("return_cache with ragged prompts is "
                                 "not supported (per-row cache lengths)")
            if ring_cache:
                raise ValueError(
                    "ring_cache with ragged prompts is not supported: "
                    "the shared padded prefill writes pad rows into "
                    "ring slots a shorter row's mask cannot exclude")
            return self._generate_ragged(params, prompt, max_new,
                                         temperature, key, prompt_lens,
                                         top_k, top_p, quantized_cache,
                                         eos_token, pad_token)
        b, plen = prompt.shape
        total = plen + max_new
        assert total <= self.max_seq, (total, self.max_seq)
        if key is None:
            key = jax.random.PRNGKey(0)
        tokens = jnp.concatenate(
            [prompt, jnp.zeros((b, max_new), jnp.int32)], axis=1)
        caches = self.init_cache(b, quantized=quantized_cache,
                                 ring=ring_cache)
        sample = functools.partial(_sample, temperature=temperature,
                                   top_k=top_k, top_p=top_p)

        if one_shot_prefill:
            logits_all, caches = self.prefill(params, prompt, caches)
            nxt, key = sample(logits_all[:, -1], key)
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, nxt, plen, 1)
            start = plen            # decode consumes positions plen..
        else:
            start = 0

        def step(carry, pos):
            tokens, caches, key = carry
            tok_t = jax.lax.dynamic_index_in_dim(tokens, pos, 1,
                                                 keepdims=False)
            logits, caches = self.decode_step(params, tok_t, pos, caches)
            nxt, key = sample(logits, key)
            # prompt positions keep their token; generated ones update
            keep = pos + 1 < plen
            cur = jax.lax.dynamic_index_in_dim(tokens, pos + 1, 1,
                                               keepdims=False)
            nxt = jnp.where(keep, cur, nxt)
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, nxt, pos + 1, 1)
            return (tokens, caches, key), None

        if eos_token is None:
            (tokens, caches, _), _ = jax.lax.scan(
                step, (tokens, caches, key),
                jnp.arange(start, total - 1))
            return (tokens, caches) if return_cache else tokens

        def cond(carry):
            tokens, pos = carry[0], carry[3]
            idx = jnp.arange(total)
            gen = (idx[None, :] >= plen) & (idx[None, :] <= pos)
            done = jnp.any((tokens == eos_token) & gen, axis=1)
            return (pos < total - 1) & ~jnp.all(done)

        def body(carry):
            new, _ = step(carry[:3], carry[3])
            return (*new, carry[3] + 1)

        tokens, _, _, _ = jax.lax.while_loop(
            cond, body, (tokens, caches, key, jnp.int32(start)))
        return _mask_after_eos(                # return_cache rejected
            tokens, plen, eos_token,           # above for eos paths
            eos_token if pad_token is None else pad_token)

    def generate_continued(self, params, prompt, max_new: int, caches,
                           past_len: int, temperature: float = 0.0,
                           key=None, top_k=None, top_p=None,
                           eos_token=None, pad_token=None,
                           return_cache: bool = False):
        """Continue generation from a FILLED KV cache (multi-turn /
        prefix-cached serving): ``caches`` holds positions
        [0, past_len); ``prompt`` [B, C] are the NEW tokens (turn-2 user
        input — when chaining from :meth:`generate`, prepend its last
        sampled token, whose k/v was never written).  The new chunk is
        chunk-prefilled in ONE :meth:`decode_chunk` dispatch at offset
        ``past_len`` (the shared prefix is never recomputed — the whole
        point), then ``max_new`` tokens decode as usual.

        ``past_len`` is static (per-length compilation, the standard
        non-paged serving contract).  Returns the NEW segment
        ``[B, C + max_new]`` (``return_cache=True``: plus the cache,
        filled through ``past_len + C + max_new − 1``, ready for the
        next turn)."""
        if return_cache and eos_token is not None:
            # same contract as generate(): an early eos exit leaves the
            # cache filled only to the exit position, so the "ready for
            # the next turn" promise would be false
            raise ValueError(
                "return_cache with eos_token is not supported: early "
                "exit leaves the cache partially filled")
        b, clen = prompt.shape
        past_len = int(past_len)
        total = past_len + clen + max_new
        assert total <= self.max_seq, (total, self.max_seq)
        assert clen >= 1 and max_new >= 1
        if key is None:
            key = jax.random.PRNGKey(0)
        sample = functools.partial(_sample, temperature=temperature,
                                   top_k=top_k, top_p=top_p)

        logits, caches = self.decode_chunk(params, prompt,
                                           jnp.int32(past_len), caches)
        nxt, key = sample(logits[:, -1], key)
        tokens = jnp.concatenate(
            [prompt, jnp.zeros((b, max_new), jnp.int32)], axis=1)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, clen, 1)

        def step(carry, j):
            tokens, caches, key = carry
            tok_t = jax.lax.dynamic_index_in_dim(tokens, j, 1,
                                                 keepdims=False)
            logits, caches = self.decode_step(params, tok_t,
                                              past_len + j, caches)
            nxt, key = sample(logits, key)
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, nxt, j + 1, 1)
            return (tokens, caches, key), None

        if eos_token is None:
            (tokens, caches, _), _ = jax.lax.scan(
                step, (tokens, caches, key),
                jnp.arange(clen, clen + max_new - 1))
        else:
            def cond(carry):
                tokens, j = carry[0], carry[3]
                idx = jnp.arange(clen + max_new)
                gen = (idx[None, :] >= clen) & (idx[None, :] <= j)
                done = jnp.any((tokens == eos_token) & gen, axis=1)
                return (j < clen + max_new - 1) & ~jnp.all(done)

            def body(carry):
                new, _ = step(carry[:3], carry[3])
                return (*new, carry[3] + 1)

            tokens, caches, _, _ = jax.lax.while_loop(
                cond, body, (tokens, caches, key, jnp.int32(clen)))
            tokens = _mask_after_eos(
                tokens, clen, eos_token,
                eos_token if pad_token is None else pad_token)
        return (tokens, caches) if return_cache else tokens

    def beam_search(self, params, prompt, max_new: int, beams: int = 4,
                    eos_token=None, pad_token=None,
                    length_penalty: float = 1.0,
                    quantized_cache: bool = False, return_all=False):
        """Beam-search decoding with a KV cache: ``beams`` hypotheses
        per prompt advance together as a [B·W] decode batch; each step
        takes the top-W of the W·V joint (score + logp) candidates and
        REORDERS the cache rows by each survivor's parent beam (a
        gather along the batch axis — the classic beam-search cache
        shuffle).

        Beams that emit ``eos_token`` freeze: their single candidate
        keeps the score unchanged, so finished hypotheses compete with
        live ones.  Final ranking divides by ``len(generated) **
        length_penalty``: 0 = raw log-prob sum (favors SHORT — fewer
        negative terms), 1.0 = per-token average, and LARGER exponents
        penalize length less (favor longer hypotheses).

        Returns the best sequence per prompt ``[B, P + max_new]``
        (``return_all=True``: ``(tokens [B, W, P+max_new],
        scores [B, W])`` sorted best-first)."""
        b, plen = prompt.shape
        total = plen + max_new
        w, v = beams, self.vocab_size
        assert total <= self.max_seq, (total, self.max_seq)
        assert 1 <= w <= v, (w, v)
        assert max_new >= 1
        pad = eos_token if pad_token is None else pad_token

        logits_all, caches = self.prefill(
            params, prompt, self.init_cache(b, quantized=quantized_cache))
        logp0 = jax.nn.log_softmax(
            logits_all[:, -1].astype(jnp.float32), axis=-1)
        scores, tok0 = jax.lax.top_k(logp0, w)            # [B, W]
        caches = jax.tree.map(lambda c: jnp.repeat(c, w, axis=0), caches)
        tokens = jnp.concatenate(
            [jnp.tile(prompt[:, None, :], (1, w, 1)),
             jnp.zeros((b, w, max_new), jnp.int32)], axis=2)
        tokens = tokens.at[:, :, plen].set(tok0)
        finished = (tok0 == eos_token if eos_token is not None
                    else jnp.zeros((b, w), bool))

        def step(carry, pos):
            tokens, scores, caches, finished = carry
            tok_t = jax.lax.dynamic_index_in_dim(
                tokens, pos, 2, keepdims=False).reshape(b * w)
            logits, caches = self.decode_step(params, tok_t, pos, caches)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32), -1).reshape(b, w, v)
            if eos_token is not None:
                # a finished beam contributes exactly one candidate:
                # itself, extended by pad, score unchanged
                frozen = jnp.full((v,), -jnp.inf).at[pad].set(0.0)
                logp = jnp.where(finished[..., None], frozen, logp)
            cand = (scores[..., None] + logp).reshape(b, w * v)
            scores, idx = jax.lax.top_k(cand, w)           # [B, W]
            parent, tok = idx // v, idx % v
            tokens = jnp.take_along_axis(tokens, parent[..., None],
                                         axis=1)
            tokens = jax.lax.dynamic_update_index_in_dim(
                tokens, tok, pos + 1, 2)
            flat = (jnp.arange(b)[:, None] * w + parent).reshape(-1)
            caches = jax.tree.map(lambda c: jnp.take(c, flat, axis=0),
                                  caches)
            if eos_token is not None:
                finished = jnp.take_along_axis(finished, parent, axis=1)
                finished |= tok == eos_token
            return (tokens, scores, caches, finished), None

        (tokens, scores, _, _), _ = jax.lax.scan(
            step, (tokens, scores, caches, finished),
            jnp.arange(plen, total - 1))

        # generated length per beam (up to and incl. the first eos)
        if eos_token is not None:
            gen = tokens[:, :, plen:]
            hit = gen == eos_token
            any_eos = jnp.any(hit, axis=2)
            first = jnp.argmax(hit, axis=2)                # [B, W]
            lens = jnp.where(any_eos, first + 1, max_new)
            tokens = _mask_after_eos(
                tokens.reshape(b * w, -1), plen, eos_token, pad
            ).reshape(b, w, -1)
        else:
            lens = jnp.full((b, w), max_new)
        norm = scores / (lens.astype(jnp.float32) ** length_penalty)
        order = jnp.argsort(-norm, axis=1)
        tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
        norm = jnp.take_along_axis(norm, order, axis=1)
        if return_all:
            return tokens, norm
        return tokens[:, 0]

    def speculative_generate(self, params, draft_model, draft_params,
                             prompt, max_new: int, gamma: int = 4,
                             temperature: float = 0.0, key=None,
                             top_k=None, top_p=None,
                             quantized_cache: bool = False,
                             eos_token=None, pad_token=None,
                             return_stats: bool = False,
                             per_row: bool = True):
        """Speculative (draft-verify) decoding: a small draft model
        proposes ``gamma`` tokens autoregressively, then THIS (target)
        model scores all of them in one :meth:`decode_chunk` dispatch
        and a verified prefix is accepted plus one target token.

        * ``temperature == 0`` (greedy): the accepted prefix is the
          longest run agreeing with the target's argmax; output is
          EXACTLY the target model's own greedy decode.  Caveat for
          bf16 ``compute_dtype``: the verify pass scores γ+1 positions
          in one ``decode_chunk`` whose matmul shapes round differently
          from ``generate``'s one-token ``decode_step``, so argmax ties
          at bf16 precision can resolve differently between the two
          (observed only on untrained/near-uniform logits; a trained
          model's margins dominate the rounding).  Exactness is pinned
          by tests at f32.
        * ``temperature > 0`` (sampled): the rejection-sampling scheme —
          draft token x accepted with probability min(1, p(x)/q(x)),
          rejection resampled from ``norm(max(p − q, 0))`` (see
          :func:`_spec_accept`) — the emitted tokens are EXACTLY
          distributed as the target's (filtered) sampling distribution;
          ``top_k``/``top_p`` apply identically to both models' dists.

        Either way the draft only changes how many sequential target
        dispatches it takes.  Decode is HBM-bound (one full weight +
        cache read per step), so scoring γ+1 positions per target pass
        costs barely more than one and the wall-clock win ≈ mean
        accepted length.

        Batched (``per_row=True``, the default): every row commits its
        OWN accepted length each round — positions are [B] vectors
        through the draft steps, the verify chunk and the cache writes
        (the ragged-decode machinery).  At B ≥ 4 lockstep's min() makes
        progress collapse toward one token/round (P(all rows accept)
        decays geometrically in B), which is why it loses to plain
        decode; per-row keeps the mean acceptance per row.  Rows that
        finish (length/EOS) freeze: their ``n_acc`` is forced to 0 and
        their positions stop advancing (the dead rows' dispatches are
        the price of static shapes — same as plain batched decode).
        ``per_row=False`` keeps the lockstep-min scheme (scalar
        positions; marginally cheaper per round at B = 1).

        Returns ``[B, P + max_new]`` tokens (``return_stats=True``: also
        a dict with the target-dispatch count ``rounds`` — sequential
        decode would use ``max_new`` — and mean tokens per round).
        """
        b, plen = prompt.shape
        total = plen + max_new
        assert total + gamma <= self.max_seq, (total, gamma, self.max_seq)
        assert total + gamma <= draft_model.max_seq
        assert self.vocab_size == draft_model.vocab_size
        if max_new <= 0:
            return (prompt, {"rounds": 0}) if return_stats else prompt
        sampled = temperature > 0
        if key is None:
            key = jax.random.PRNGKey(0)

        def dist(logits):
            """Filtered target/draft sampling distribution (f32)."""
            return jax.nn.softmax(_filter_logits(
                logits.astype(jnp.float32), temperature, top_k, top_p),
                axis=-1)

        buf = total + gamma           # chunk writes may overshoot total
        tokens = jnp.concatenate(
            [prompt, jnp.zeros((b, buf - plen), jnp.int32)], axis=1)
        caches_t = self.init_cache(b, quantized=quantized_cache)
        caches_d = draft_model.init_cache(b, quantized=quantized_cache)

        # prefill both models; sample token at position P from the target
        logits_all, caches_t = self.prefill(params, prompt, caches_t)
        _, caches_d = draft_model.prefill(draft_params, prompt, caches_d)
        first, key = _sample(logits_all[:, -1], key,
                             temperature=temperature, top_k=top_k,
                             top_p=top_p)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, first, plen, 1)
        cur0 = jnp.int32(plen + 1)    # tokens[:, :cur] are final
        if per_row:
            cur0 = jnp.full((b,), cur0)
        rows = jnp.arange(b)

        def tok_at(tokens, p):
            """tokens[:, p] for scalar p, tokens[b, p[b]] for vector."""
            if per_row:
                return jnp.take_along_axis(tokens, p[:, None], 1)[:, 0]
            return jax.lax.dynamic_index_in_dim(tokens, p, 1,
                                                keepdims=False)

        def put_at(tokens, p, val):
            if per_row:
                return tokens.at[rows, p].set(val)
            return jax.lax.dynamic_update_index_in_dim(tokens, val, p, 1)

        def row_done(tokens, cur):
            """[B] bool: row finished by length or by an emitted EOS."""
            done = cur >= total
            if eos_token is not None:
                idx = jnp.arange(buf)[None, :]
                gen = (idx >= plen) & (idx < cur[:, None])
                done |= jnp.any((tokens == eos_token) & gen, axis=1)
            return done

        def draft_round(tokens, cur, cd, key):
            def step(carry, j):
                tokens, cd, key = carry
                p = cur - 1 + j        # scalar, or [B] per-row
                logits, cd = draft_model.decode_step(
                    draft_params, tok_at(tokens, p), p, cd)
                if sampled:
                    q = dist(logits)
                    key, sk = jax.random.split(key)
                    nxt = jax.random.categorical(
                        sk, jnp.log(jnp.maximum(q, 1e-38))
                    ).astype(jnp.int32)
                else:
                    q = jnp.zeros((b, 1), jnp.float32)   # unused
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tokens = put_at(tokens, p + 1, nxt)
                return (tokens, cd, key), q
            (tokens, cd, key), qs = jax.lax.scan(
                step, (tokens, cd, key), jnp.arange(gamma))
            return tokens, cd, key, qs.transpose(1, 0, 2)  # [B, γ, V]

        def body(carry):
            tokens, cur, ct, cd, rounds, hist, key = carry
            tokens, cd, key, q = draft_round(tokens, cur, cd, key)
            if per_row:
                cidx = (cur - 1)[:, None] + jnp.arange(gamma + 1)[None]
                chunk = jnp.take_along_axis(tokens, cidx, axis=1)
            else:
                chunk = jax.lax.dynamic_slice_in_dim(
                    tokens, cur - 1, gamma + 1, 1)      # [B, γ+1]
            logits, ct = self.decode_chunk(params, chunk, cur - 1, ct)
            drafts = chunk[:, 1:]                       # [B, γ]
            if sampled:
                accept = _spec_accept_rows if per_row else _spec_accept
                n_acc, nxt, key = accept(key, drafts, q, dist(logits))
            else:
                tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                match = (tgt[:, :gamma] == drafts)      # [B, γ]
                n_row = jnp.sum(jnp.cumprod(
                    match.astype(jnp.int32), axis=1), axis=1)
                n_acc = n_row if per_row else jnp.min(n_row)
                gi = (n_acc[:, None] if per_row
                      else jnp.full((b, 1), n_acc))
                nxt = jnp.take_along_axis(tgt, gi, axis=1)[:, 0]
            # full acceptance (n_acc == γ): the next round starts
            # drafting at cur+γ, so position cur+γ-1 (the last accepted
            # draft) would never be written into the DRAFT cache — a
            # permanent zero-K/V row every subsequent draft step
            # attends, degrading q and the acceptance rate over long
            # generations.  Backfill it with one draft decode step.
            if per_row:
                done = row_done(tokens, cur)
                n_acc = jnp.where(done, 0, n_acc)
                # acceptance telemetry: count each LIVE row's accepted
                # length this round (serving observability; also the
                # instrument that separates draft quality from round
                # cost when tuning gamma)
                hist = hist + jnp.sum(
                    jax.nn.one_hot(n_acc, gamma + 1, dtype=jnp.int32)
                    * (~done)[:, None].astype(jnp.int32), axis=0)
                tokens = jnp.where(done[:, None], tokens,
                                   put_at(tokens, cur + n_acc, nxt))
                # per-row backfill, unconditional: full-acceptance rows
                # fill their cur+γ−1 hole; every other row (re)writes
                # position cur+n_acc — the entry next round's first
                # draft step recomputes identically (overwrite-by-
                # position cache), so the rewrite is never read stale.
                pb = cur + jnp.where(n_acc == gamma, gamma - 1, n_acc)
                _, cd = draft_model.decode_step(
                    draft_params, tok_at(tokens, pb), pb, cd)
                cur = jnp.where(done, cur, cur + n_acc + 1)
            else:
                tokens = put_at(tokens, cur + n_acc, nxt)
                def backfill(cd):
                    tok = jax.lax.dynamic_index_in_dim(
                        tokens, cur + gamma - 1, 1, keepdims=False)
                    _, cd = draft_model.decode_step(
                        draft_params, tok, cur + gamma - 1, cd)
                    return cd
                cd = jax.lax.cond(n_acc == gamma, backfill,
                                  lambda c: c, cd)
                cur = cur + n_acc + 1
                hist = hist + jax.nn.one_hot(n_acc, gamma + 1,
                                             dtype=jnp.int32)
            return tokens, cur, ct, cd, rounds + 1, hist, key

        def cond(carry):
            tokens, cur = carry[0], carry[1]
            if per_row:
                return jnp.any(~row_done(tokens, cur))
            go = cur < total
            if eos_token is not None:
                idx = jnp.arange(buf)[None, :]
                gen = (idx >= plen) & (idx < cur)
                done = jnp.any((tokens == eos_token) & gen, axis=1)
                go &= ~jnp.all(done)
            return go

        tokens, cur, _, _, rounds, hist, _ = jax.lax.while_loop(
            cond, body, (tokens, cur0, caches_t, caches_d,
                         jnp.int32(0),
                         jnp.zeros((gamma + 1,), jnp.int32), key))
        out = tokens[:, :total]
        if eos_token is not None:
            out = _mask_after_eos(
                out, plen, eos_token,
                eos_token if pad_token is None else pad_token)
        if return_stats:
            adv = jnp.mean(cur - cur0) if per_row else cur - cur0
            return out, {"rounds": rounds,
                         "tokens_per_round": adv / jnp.maximum(
                             rounds, 1),
                         # accept_hist[k] = live-row rounds that
                         # accepted exactly k drafts; row_tokens =
                         # per-row emitted counts (per_row mode)
                         "accept_hist": hist,
                         "row_tokens": (cur - cur0 if per_row
                                        else None)}
        return out

    def _generate_ragged(self, params, prompt, max_new: int,
                         temperature, key, prompt_lens,
                         top_k=None, top_p=None,
                         quantized_cache: bool = False,
                         eos_token=None, pad_token=None):
        """Ragged-batch generation (see :meth:`generate`): shared
        prefill, then per-row positions through the decode scan."""
        b, plen = prompt.shape
        total = plen + max_new
        assert total <= self.max_seq, (total, self.max_seq)
        if key is None:
            key = jax.random.PRNGKey(0)
        # loud validation when lengths are concrete (the usual host-side
        # list/ndarray) — out-of-range rows would otherwise clamp into
        # pad positions and silently emit garbage
        if not isinstance(prompt_lens, jax.core.Tracer):
            _l = jnp.asarray(prompt_lens)
            import numpy as _np
            _ln = _np.asarray(_l)
            assert _ln.min() >= 1 and _ln.max() <= plen, (
                f"prompt_lens must be in [1, {plen}], got "
                f"[{_ln.min()}, {_ln.max()}]")
        lens = jnp.asarray(prompt_lens, jnp.int32)
        rows = jnp.arange(b)
        tokens = jnp.concatenate(
            [prompt, jnp.zeros((b, max_new), jnp.int32)], axis=1)
        sample = functools.partial(_sample, temperature=temperature,
                                   top_k=top_k, top_p=top_p)

        logits_all, caches = self.prefill(
            params, prompt, self.init_cache(b, quantized=quantized_cache))
        logits0 = jnp.take_along_axis(
            logits_all, (lens - 1)[:, None, None], axis=1)[:, 0]
        nxt, key = sample(logits0, key)
        tokens = tokens.at[rows, lens].set(nxt)

        def step(carry, t):
            tokens, caches, key = carry
            pos = lens + t                                 # [B]
            tok_t = jnp.take_along_axis(tokens, pos[:, None],
                                        axis=1)[:, 0]
            logits, caches = self.decode_step(params, tok_t, pos,
                                              caches)
            nxt, key = sample(logits, key)
            tokens = tokens.at[rows, pos + 1].set(nxt)
            return (tokens, caches, key), None

        if eos_token is None:
            (tokens, _, _), _ = jax.lax.scan(
                step, (tokens, caches, key), jnp.arange(max_new - 1))
            return tokens

        def cond(carry):
            tokens, t = carry[0], carry[3]
            idx = jnp.arange(tokens.shape[1])[None, :]
            gen = (idx >= lens[:, None]) & (idx <= (lens + t)[:, None])
            done = jnp.any((tokens == eos_token) & gen, axis=1)
            return (t < max_new - 1) & ~jnp.all(done)

        def body(carry):
            new, _ = step(carry[:3], carry[3])
            return (*new, carry[3] + 1)

        tokens, _, _, _ = jax.lax.while_loop(
            cond, body, (tokens, caches, key, jnp.int32(0)))
        return _mask_after_eos(
            tokens, lens, eos_token,
            eos_token if pad_token is None else pad_token)
