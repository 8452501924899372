"""Transformer building blocks (beyond-reference scope).

The reference has no attention, no sequence dimension, no normalization
layer of any kind (SURVEY.md §5.7: "no attention, no transformer");
this module extends the framework with the layers a modern TPU workload
actually runs: LayerNorm, Embedding, multi-head attention over the flash
kernel (``ops.attention``), and the pre-LN transformer block.

Everything follows the repo's functional module contract
(``nn/module.py``): static config on the module, params as plain pytrees,
pure ``apply``.  Mixed precision is a first-class knob — params stay f32,
``compute_dtype=jnp.bfloat16`` casts activations so matmuls/attention run
single-pass bf16 on the MXU while LayerNorm statistics and the softmax
(inside the flash kernel) stay f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from taper_tpu import ops
from taper_tpu.nn.module import Module
from taper_tpu.nn.layers import Dropout


class LayerNorm(Module):
    """LayerNorm over the last axis; statistics in f32 at any input dtype."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.dim = dim
        self.eps = eps

    def init(self, key):
        return {"g": jnp.ones((self.dim,), jnp.float32),
                "b": jnp.zeros((self.dim,), jnp.float32)}

    def apply(self, params, x, *, train=False, rng=None):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * params["g"] + params["b"]).astype(x.dtype)


class RMSNorm(Module):
    """RMS normalization (no mean subtraction, no bias) — the Llama-
    lineage norm; one fewer reduction than LayerNorm and the standard
    choice for modern decoder LMs.  Statistics in f32 at any dtype."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.dim = dim
        self.eps = eps

    def init(self, key):
        return {"g": jnp.ones((self.dim,), jnp.float32)}

    def apply(self, params, x, *, train=False, rng=None):
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + self.eps)
                * params["g"]).astype(x.dtype)


class Embedding(Module):
    """Token/position embedding table ``[num_embeddings, dim]``."""

    def __init__(self, num_embeddings: int, dim: int, init_std: float = 0.02):
        self.num_embeddings = num_embeddings
        self.dim = dim
        self.init_std = init_std

    def init(self, key):
        w = jax.random.normal(key, (self.num_embeddings, self.dim),
                              jnp.float32) * self.init_std
        return {"w": w}

    def apply(self, params, ids, *, train=False, rng=None):
        w = params["w"]
        if _is_qt(w):       # PTQ'd table: dequantize in the jitted fwd
            w = w.dequantize()
        return jnp.take(w, ids, axis=0)


def _is_qt(w):
    from taper_tpu.quantization.qtensor import QuantizedTensor
    return isinstance(w, QuantizedTensor)


def _proj(x2, w, b):
    """[R, E_in] @ w[E_out, E_in]^T + b, at the activation dtype.

    ``ops.linear`` accumulates in f32 (preferred_element_type) and
    therefore returns f32 even for bf16 inputs; cast back so a bf16
    trunk stays bf16 end-to-end.  ``w`` may be a PTQ
    :class:`QuantizedTensor` — it goes to ``ops.linear`` untouched so
    the int8 dequant-on-load path applies (serving) — or a
    :class:`~taper_tpu.nn.lora.BankedLoRA` (per-row multi-tenant
    adapters: base matmul once, plus two rank-r contractions gathering
    each row's own adapter)."""
    from taper_tpu.nn.lora import BankedLoRA
    if isinstance(w, BankedLoRA):
        assert w.ids.shape[0] == x2.shape[0], (
            f"BankedLoRA row ids ({w.ids.shape[0]}) must match the "
            f"projection's input rows ({x2.shape[0]})")
        y = _proj(x2, w.w, b)
        ids = jnp.clip(w.ids, 0, w.a.shape[0] - 1)
        af = jnp.take(w.a, ids, axis=0).astype(x2.dtype)  # [R, r, in]
        bf = jnp.take(w.b, ids, axis=0).astype(x2.dtype)  # [R, out, r]
        u = jnp.einsum("be,bre->br", x2, af,
                       preferred_element_type=jnp.float32)
        delta = jnp.einsum("br,bor->bo", u.astype(x2.dtype), bf,
                           preferred_element_type=jnp.float32)
        live = (w.ids >= 0).astype(delta.dtype)[:, None]
        return (y + w.scale * delta * live).astype(x2.dtype)
    if _is_qt(w):
        import os
        from taper_tpu.quantization.config import QuantizationType
        if (os.environ.get("TAPER_W8A8") == "1"
                and w.qtype == QuantizationType.INT8
                and x2.shape[0] >= 256):
            # W8A8 quantizes the activations immediately — keep them
            # bf16: an f32 upcast would MATERIALIZE a 2x HBM copy
            # (converts cannot fuse into a pallas_call input) and the
            # row-quant kernel casts to f32 in VMEM anyway, where the
            # bf16->f32 cast is exact.  Condition mirrors ops.linear's
            # W8A8 engage test so non-engaging shapes keep f32.
            y = ops.linear(x2, w, b)
        else:
            y = ops.linear(x2.astype(jnp.float32), w, b)
    else:
        y = ops.linear(x2, w.astype(x2.dtype),
                       None if b is None else b.astype(x2.dtype))
    return y.astype(x2.dtype)


class MultiHeadAttention(Module):
    """Multi-head self-attention over ``ops.attention`` (flash on the
    pallas backend; oracle on xla).  Input ``[B, S, E]``."""

    def __init__(self, dim: int, num_heads: int, causal: bool = True,
                 bias: bool = True, init_std: float = 0.02,
                 out_init_std: Optional[float] = None,
                 rope: bool = False, max_seq: int = 4096,
                 num_kv_heads: Optional[int] = None,
                 window: Optional[int] = None):
        assert dim % num_heads == 0, (dim, num_heads)
        self.dim = dim
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        # GQA: fewer K/V heads than Q heads (num_kv_heads=1 is MQA); the
        # KV cache shrinks by num_heads/num_kv_heads — the serving win.
        self.num_kv_heads = (num_heads if num_kv_heads is None
                             else num_kv_heads)
        assert num_heads % self.num_kv_heads == 0, \
            (num_heads, self.num_kv_heads)
        self.kv_groups = num_heads // self.num_kv_heads
        self.kv_dim = self.num_kv_heads * self.head_dim
        self.causal = causal
        self.use_bias = bias
        self.init_std = init_std
        self.out_init_std = (init_std if out_init_std is None
                             else out_init_std)
        self.rope = rope
        self.max_seq = max_seq
        self.window = window
        if rope:
            self._rope = rope_angles(self.head_dim, max_seq)

    def init(self, key):
        ks = jax.random.split(key, 4)
        def w(k, out, std):
            return jax.random.normal(k, (out, self.dim), jnp.float32) * std
        p = {"wq": w(ks[0], self.dim, self.init_std),
             "wk": w(ks[1], self.kv_dim, self.init_std),
             "wv": w(ks[2], self.kv_dim, self.init_std),
             "wo": w(ks[3], self.dim, self.out_init_std)}
        if self.use_bias:
            p["bq"] = jnp.zeros((self.dim,), jnp.float32)
            p["bk"] = jnp.zeros((self.kv_dim,), jnp.float32)
            p["bv"] = jnp.zeros((self.kv_dim,), jnp.float32)
            p["bo"] = jnp.zeros((self.dim,), jnp.float32)
        return p

    def apply(self, params, x, *, train=False, rng=None,
              segment_ids=None, positions=None):
        """``segment_ids`` [B, S] (packed sequences): attention is
        masked to same-segment keys; ``positions`` [B, S] gives every
        token its own RoPE position (restarting per document)."""
        b, s, e = x.shape
        x2 = x.reshape(b * s, e)

        # TRANSPOSE-FREE path (lane-tile-aligned heads): q/k/v stay in
        # the projections' [B, S, H·D] layout end to end — the flash
        # kernels slice heads out of the lane dim via index maps
        # (ops.attention_bshd), RoPE rotates through a contiguous
        # reshape view, and the output projection consumes the
        # attention output directly.  Kills the [B,S,HD] → [B,H,S,D]
        # relayout copies around every attention call — the largest
        # non-matmul item in the 170M train-step budget
        # (benchmarks/probe_mfu_budget.py).
        import os
        if (self.head_dim % 128 == 0 and segment_ids is None
                and self.window is None
                and (positions is None or jnp.ndim(positions) != 1)
                and os.environ.get("TAPER_ATTN_BSHD", "1") == "1"):
            qf = _proj(x2, params["wq"], params.get("bq")).reshape(b, s, e)
            kf = _proj(x2, params["wk"], params.get("bk"))\
                .reshape(b, s, self.kv_dim)
            vf = _proj(x2, params["wv"], params.get("bv"))\
                .reshape(b, s, self.kv_dim)
            if self.rope:
                cos, sin = self._rope
                off = 0 if positions is None else positions
                qf = apply_rope_bshd(qf, cos, sin, self.num_heads,
                                     offset=off)
                kf = apply_rope_bshd(kf, cos, sin, self.num_kv_heads,
                                     offset=off)
            o2 = ops.attention_bshd(qf, kf, vf, self.num_heads,
                                    causal=self.causal)
            out = _proj(o2.reshape(b * s, e), params["wo"],
                        params.get("bo"))
            return out.reshape(b, s, e)

        def heads(w_name, b_name, n_heads):
            y = _proj(x2, params[w_name], params.get(b_name))
            return y.reshape(b, s, n_heads,
                             self.head_dim).transpose(0, 2, 1, 3)

        q = heads("wq", "bq", self.num_heads)
        k = heads("wk", "bk", self.num_kv_heads)
        v = heads("wv", "bv", self.num_kv_heads)
        if self.rope:
            cos, sin = self._rope
            off = 0 if positions is None else positions
            q = apply_rope(q, cos, sin, offset=off)
            k = apply_rope(k, cos, sin, offset=off)
        # GQA (kv_groups > 1) passes the COMPACT K/V straight through:
        # the flash kernels read each kv head across its query group via
        # index maps (no repeated-K/V materialization, residuals stay at
        # num_kv_heads width) and the XLA oracle broadcasts internally.
        o = ops.attention(q, k, v, causal=self.causal,
                          window=self.window, segment_ids=segment_ids)
        o2 = o.transpose(0, 2, 1, 3).reshape(b * s, e)
        out = _proj(o2, params["wo"], params.get("bo"))
        return out.reshape(b, s, e)


class MLPBlock(Module):
    """Position-wise FFN: Linear → GELU → Linear (hidden = ratio·dim).

    ``gated=True`` makes it SwiGLU (Llama-style): ``w2·(silu(w1·x) ⊙
    w3·x)`` — a third projection gates the hidden activations; both
    up-projections fuse into the same batched GEMM shape on the MXU."""

    def __init__(self, dim: int, ratio: int = 4, bias: bool = True,
                 init_std: float = 0.02,
                 out_init_std: Optional[float] = None,
                 gated: bool = False):
        self.dim = dim
        self.hidden = ratio * dim
        self.use_bias = bias
        self.gated = gated
        self.init_std = init_std
        self.out_init_std = (init_std if out_init_std is None
                             else out_init_std)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"w1": jax.random.normal(k1, (self.hidden, self.dim),
                                     jnp.float32) * self.init_std,
             "w2": jax.random.normal(k2, (self.dim, self.hidden),
                                     jnp.float32) * self.out_init_std}
        if self.gated:
            p["w3"] = jax.random.normal(
                k3, (self.hidden, self.dim), jnp.float32) * self.init_std
        if self.use_bias:
            p["b1"] = jnp.zeros((self.hidden,), jnp.float32)
            p["b2"] = jnp.zeros((self.dim,), jnp.float32)
            if self.gated:
                p["b3"] = jnp.zeros((self.hidden,), jnp.float32)
        return p

    def apply(self, params, x, *, train=False, rng=None):
        b, s, e = x.shape
        x2 = x.reshape(b * s, e)
        h = _proj(x2, params["w1"], params.get("b1"))
        if self.gated:
            h = jax.nn.silu(h) * _proj(x2, params["w3"],
                                       params.get("b3"))
        else:
            h = jax.nn.gelu(h)
        y = _proj(h, params["w2"], params.get("b2"))
        return y.reshape(b, s, e)


class TransformerBlock(Module):
    """Pre-LN block: ``x + MHA(LN(x))`` then ``x + FFN(LN(x))``."""

    def __init__(self, dim: int, num_heads: int, causal: bool = True,
                 mlp_ratio: int = 4, dropout: float = 0.0,
                 init_std: float = 0.02,
                 out_init_std: Optional[float] = None,
                 rope: bool = False, max_seq: int = 4096,
                 num_kv_heads: Optional[int] = None,
                 n_experts: int = 0, top_k: int = 2,
                 window: Optional[int] = None,
                 capacity_factor: Optional[float] = None,
                 norm: str = "layer", mlp_act: str = "gelu"):
        assert norm in ("layer", "rms"), norm
        assert mlp_act in ("gelu", "swiglu"), mlp_act
        norm_cls = RMSNorm if norm == "rms" else LayerNorm
        self.ln1 = norm_cls(dim)
        self.attn = MultiHeadAttention(dim, num_heads, causal=causal,
                                       init_std=init_std,
                                       out_init_std=out_init_std,
                                       rope=rope, max_seq=max_seq,
                                       num_kv_heads=num_kv_heads,
                                       window=window)
        self.ln2 = norm_cls(dim)
        # n_experts > 0 swaps the FFN for a top-k-gated MoE (MoEMLP is
        # defined below in this module; resolved at call time)
        if n_experts > 0:
            self.mlp = MoEMLP(dim, n_experts, ratio=mlp_ratio,
                              top_k=top_k, init_std=init_std,
                              out_init_std=out_init_std,
                              capacity_factor=capacity_factor)
        else:
            self.mlp = MLPBlock(dim, ratio=mlp_ratio, init_std=init_std,
                                out_init_std=out_init_std,
                                gated=mlp_act == "swiglu")
        self.drop = Dropout(dropout) if dropout > 0 else None

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {"ln1": self.ln1.init(ks[0]), "attn": self.attn.init(ks[1]),
                "ln2": self.ln2.init(ks[2]), "mlp": self.mlp.init(ks[3])}

    def apply(self, params, x, *, train=False, rng=None,
              segment_ids=None, positions=None):
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        a = self.attn.apply(params["attn"],
                            self.ln1.apply(params["ln1"], x),
                            segment_ids=segment_ids, positions=positions)
        if self.drop is not None:
            a = self.drop.apply({}, a, train=train, rng=r1)
        x = x + a
        m = self.mlp.apply(params["mlp"],
                           self.ln2.apply(params["ln2"], x))
        if self.drop is not None:
            m = self.drop.apply({}, m, train=train, rng=r2)
        return x + m


# ---------------------------------------------------------------------------
# KV-cache decode path (serving)
# ---------------------------------------------------------------------------

def _decode_attention(q, k_cache, v_cache, pos, scale, window=None,
                      k_scale=None, v_scale=None, q_offsets=None,
                      ring=False):
    """Single- or few-position attention against a static-shape KV cache.

    ``q``: [B, H, Q, D]; caches: [B, H, Smax, D]; ``pos``: the index of
    the current token — entries past ``pos`` are masked out.  ``pos``
    may be a [B] vector (ragged serving: each row at its own position).
    ``q_offsets`` [Q] (chunked decode — speculative verification): query
    row r sits at absolute position ``pos + q_offsets[r]`` and attends
    cache entries up to there; omitted = all rows at ``pos``.
    A matvec/skinny matmul, not a square matmul: XLA handles it at HBM
    roofline, so no Pallas here (the flash kernel earns its keep on the
    S×S training path).

    **Quantized caches** (``k_scale``/``v_scale`` [B, H, Smax] given):
    caches hold int8 rows with one symmetric scale per (batch, head,
    position); the int8→f32 convert fuses into the dot's HBM read, so
    the decode step reads a quarter (vs f32) / half (vs bf16) of the
    cache bytes — the dominant traffic at long context.  The
    per-position k scale folds into the scores AFTER the dot; the v
    scale folds into the softmax weights BEFORE the dot.

    **Ring caches** (``ring=True``, sliding-window models): the cache
    holds only the last W positions; slot ``s`` carries absolute
    position ``pos − ((pos − s) mod W)``.  Decode reads/memory become
    O(W) instead of O(Smax); the only mask needed is "absolute
    position ≥ 0" (the window bounds hold by construction)."""
    kc, qq = k_cache, q
    if k_scale is not None:
        kc, qq = k_cache.astype(jnp.float32), q.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qq, kc,
                   preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        s = s * k_scale[:, :, None, :]
    idx = jnp.arange(k_cache.shape[2])
    off = (jnp.zeros((q.shape[2],), jnp.int32) if q_offsets is None
           else jnp.asarray(q_offsets, jnp.int32))
    w_ring = k_cache.shape[2]
    if jnp.ndim(pos) == 1:
        qpos = pos[:, None] + off[None, :]             # [B, Q]
        if ring:
            absp = qpos[:, :, None] - (qpos[:, :, None]
                                       - idx[None, None, :]) % w_ring
            mask = absp >= 0                           # [B, Q, S]
        else:
            mask = idx[None, None, :] <= qpos[:, :, None]
            if window is not None:
                mask &= idx[None, None, :] > qpos[:, :, None] - window
        mask = mask[:, None, :, :]
    else:
        qpos = pos + off                               # [Q]
        if ring:
            absp = qpos[:, None] - (qpos[:, None]
                                    - idx[None, :]) % w_ring
            mask = absp >= 0                           # [Q, S]
        else:
            mask = idx[None, :] <= qpos[:, None]       # [Q, S]
            if window is not None:
                mask &= idx[None, :] > qpos[:, None] - window
        mask = mask[None, None, :, :]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, :]
        return jnp.einsum("bhqk,bhkd->bhqd", p,
                          v_cache.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    p = p.astype(v_cache.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v_cache)


def kv_quantize(x):
    """Symmetric int8 row quantization for KV cache entries: one scale
    per (batch, head, position), amax over the head dim.  Returns
    ``(int8 rows, f32 scales [..., :-1 dims])``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(xf / scale[..., None])
    return q.astype(jnp.int8), scale


def _cache_write(cache, k, v, pos, ring=False):
    """Write new K/V rows ``[B, kvh, C, D]`` into the cache at positions
    ``[pos, pos+C)``.  ``pos`` may be a scalar (all rows aligned —
    prefill, lockstep decode) or a [B] vector of per-row starts (ragged
    serving and per-row speculative verification, where row ``b``'s C
    tokens land at ``[pos[b], pos[b]+C)``; C > 1 is supported).  Caller
    obligation for vector ``pos``: ``pos[b] + C <= Smax`` for every row —
    ``dynamic_update_slice`` clamps the start silently otherwise, which
    would overwrite the tail rows rather than raise.  Quantizes the rows
    when the cache is int8 (``k_scale`` present).  The single write path
    shared by decode, prefill and chunked-decode.

    ``ring=True``: the cache is a W-slot ring (W = its length); absolute
    position ``p`` lands in slot ``p % W`` and rows older than the last
    W are dropped (only they would be overwritten anyway)."""
    quantized = "k_scale" in cache
    if quantized:
        k, k_sc = kv_quantize(k)
        v, v_sc = kv_quantize(v)
    if ring:
        w = cache["k"].shape[2]
        c = k.shape[2]
        if jnp.ndim(pos) == 1:
            slot = pos % w
        else:
            if c > w:          # only the last W rows survive anyway
                k, v = k[:, :, c - w:], v[:, :, c - w:]
                if quantized:
                    k_sc, v_sc = k_sc[:, :, c - w:], v_sc[:, :, c - w:]
                pos, c = pos + (c - w), w
            slots = (pos + jnp.arange(c)) % w
            new = {"k": cache["k"].at[:, :, slots].set(
                       k.astype(cache["k"].dtype)),
                   "v": cache["v"].at[:, :, slots].set(
                       v.astype(cache["v"].dtype))}
            if quantized:
                new["k_scale"] = cache["k_scale"].at[:, :, slots].set(
                    k_sc)
                new["v_scale"] = cache["v_scale"].at[:, :, slots].set(
                    v_sc)
            return new
        pos = slot
    if jnp.ndim(pos) == 1:
        # per-row positions: row b's C tokens land at [pos[b], pos[b]+C)
        # (ragged serving C == 1; per-row speculative verification
        # C == γ+1 — callers guarantee pos[b] + C ≤ Smax so the
        # dynamic_update_slice clamp never fires)
        c_new = k.shape[2]
        cache_bytes = cache["k"].size * cache["k"].dtype.itemsize
        if 1 < c_new <= 8 and cache_bytes <= (8 << 20):
            # C-token window write, small cache (per-row speculative
            # verification): same masked-streaming idea as the C == 1
            # path below, with the source row gathered along the tiny
            # C axis — rel = s − pos[b] picks u[b, :, rel] where the
            # window covers s
            s_idx = jnp.arange(cache["k"].shape[2])
            rel = s_idx[None, :] - pos[:, None]              # [B, S]
            m = ((rel >= 0) & (rel < c_new))[:, None, :, None]
            idx = jnp.clip(rel, 0, c_new - 1)[:, None, :, None]
            gk = jnp.take_along_axis(k.astype(cache["k"].dtype),
                                     idx, axis=2)
            gv = jnp.take_along_axis(v.astype(cache["v"].dtype),
                                     idx, axis=2)
            new = {"k": jnp.where(m, gk, cache["k"]),
                   "v": jnp.where(m, gv, cache["v"])}
            if quantized:
                m2, i2 = m[..., 0], idx[..., 0]
                new["k_scale"] = jnp.where(
                    m2, jnp.take_along_axis(k_sc, i2, axis=2),
                    cache["k_scale"])
                new["v_scale"] = jnp.where(
                    m2, jnp.take_along_axis(v_sc, i2, axis=2),
                    cache["v_scale"])
            return new
        if c_new == 1 and cache_bytes <= (8 << 20):
            # SMALL caches: the batched dynamic_update_slice lowers to
            # an XLA scatter whose fixed cost dominates (measured v5e,
            # B=8 S=272: +153 us/step on a 7M draft, +542 on a 151M
            # model — the ragged-decode tax).  A masked full-cache
            # select is pure streaming bandwidth (2x cache bytes ≈ 4 us
            # at these sizes) and 4-5x cheaper.  LARGE caches invert:
            # select scales with cache size, scatter doesn't — the
            # serving configs (S=4096, 67 MB/layer) keep the scatter.
            s_idx = jnp.arange(cache["k"].shape[2])
            m = (s_idx[None, :] == pos[:, None])[:, None, :, None]
            new = {"k": jnp.where(m, k.astype(cache["k"].dtype),
                                  cache["k"]),
                   "v": jnp.where(m, v.astype(cache["v"].dtype),
                                  cache["v"])}
            if quantized:
                m2 = m[..., 0]
                new["k_scale"] = jnp.where(m2, k_sc, cache["k_scale"])
                new["v_scale"] = jnp.where(m2, v_sc, cache["v_scale"])
            return new
        upd = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u, (0, p, 0)))
        new = {"k": upd(cache["k"], k.astype(cache["k"].dtype), pos),
               "v": upd(cache["v"], v.astype(cache["v"].dtype), pos)}
        if quantized:
            upd2 = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                c, u, (0, p)))
            new["k_scale"] = upd2(cache["k_scale"], k_sc, pos)
            new["v_scale"] = upd2(cache["v_scale"], v_sc, pos)
        return new
    new = {"k": jax.lax.dynamic_update_slice_in_dim(
               cache["k"], k.astype(cache["k"].dtype), pos, 2),
           "v": jax.lax.dynamic_update_slice_in_dim(
               cache["v"], v.astype(cache["v"].dtype), pos, 2)}
    if quantized:
        new["k_scale"] = jax.lax.dynamic_update_slice_in_dim(
            cache["k_scale"], k_sc, pos, 2)
        new["v_scale"] = jax.lax.dynamic_update_slice_in_dim(
            cache["v_scale"], v_sc, pos, 2)
    return new


def mha_init_cache(mha: MultiHeadAttention, batch: int, max_seq: int,
                   dtype=jnp.float32, quantized: bool = False,
                   ring: bool = False):
    """``quantized=True``: int8 rows + one f32 scale per (batch, head,
    position) — 4×/2× less decode-time cache traffic than f32/bf16
    (see :func:`_decode_attention`); ``dtype`` is then ignored.

    ``ring=True`` (sliding-window models only): allocate W slots
    instead of ``max_seq`` — decode memory AND reads drop to O(W).
    Ring-ness is carried by the cache length (< max_seq)."""
    kvh = getattr(mha, "num_kv_heads", mha.num_heads)
    if ring:
        assert mha.window is not None and mha.window < max_seq, \
            "ring caches need a sliding-window model"
        max_seq = mha.window
    shape = (batch, kvh, max_seq, mha.head_dim)
    if quantized:
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def mha_apply_decode(mha: MultiHeadAttention, params, x_t, cache, pos):
    """One decode step: ``x_t`` [B, 1, E] at position ``pos`` (traced
    scalar).  Returns ``(y [B, 1, E], new_cache)``."""
    b, one, e = x_t.shape
    x2 = x_t.reshape(b, e)

    def proj_heads(w_name, b_name, n_heads):
        y = _proj(x2, params[w_name], params.get(b_name))
        return y.reshape(b, n_heads, 1, mha.head_dim)

    q = proj_heads("wq", "bq", mha.num_heads)
    k = proj_heads("wk", "bk", mha.num_kv_heads)
    v = proj_heads("wv", "bv", mha.num_kv_heads)
    if mha.rope:
        cos, sin = mha._rope
        q = apply_rope(q, cos, sin, offset=pos)
        k = apply_rope(k, cos, sin, offset=pos)
    ring = cache["k"].shape[2] < mha.max_seq    # W-slot ring cache
    new_cache = _cache_write(cache, k, v, pos, ring=ring)
    k_cache, v_cache = new_cache["k"], new_cache["v"]
    scales = ({"k_scale": new_cache["k_scale"],
               "v_scale": new_cache["v_scale"]}
              if "k_scale" in new_cache else {})
    if mha.kv_groups > 1:
        # GQA: never repeat the cache (that would re-spend the HBM
        # bandwidth GQA saves) — fold the query groups into the query
        # dim instead: [B, kvh, groups, D] against the kv-sized cache.
        qg = q.reshape(b, mha.num_kv_heads, mha.kv_groups, mha.head_dim)
        o = _decode_attention(qg, k_cache, v_cache, pos,
                              mha.head_dim ** -0.5, mha.window,
                              ring=ring, **scales)
        o2 = o.reshape(b, e)
    else:
        o = _decode_attention(q, k_cache, v_cache, pos,
                              mha.head_dim ** -0.5, mha.window,
                              ring=ring, **scales)
        o2 = o.transpose(0, 2, 1, 3).reshape(b, e)
    o2 = o2.astype(x2.dtype)
    y = _proj(o2, params["wo"], params.get("bo"))
    return y.reshape(b, 1, e), new_cache


def mha_apply_decode_paged(mha: MultiHeadAttention, params, x_t, pools,
                           tables, pos, impl=None):
    """One decode step against a PAGED KV cache (block pool + table;
    see ops/pallas/paged_attention.py).  ``x_t`` [B, 1, E]; ``pools``
    {"k","v": [n_blocks, kvh, bs, D]}; ``tables`` [B, mb] int32;
    ``pos`` [B] per-row positions (paged serving is inherently ragged).
    Returns ``(y [B, 1, E], new_pools)``."""
    from taper_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_write, paged_write_scale)
    assert mha.window is None, \
        "paged caches are for full-attention models; window models " \
        "use the O(W) ring cache instead"
    assert jnp.ndim(pos) == 1, "paged decode takes per-row positions"
    b, one, e = x_t.shape
    x2 = x_t.reshape(b, e)

    def proj_heads(w_name, b_name, n_heads):
        y = _proj(x2, params[w_name], params.get(b_name))
        return y.reshape(b, n_heads, 1, mha.head_dim)

    q = proj_heads("wq", "bq", mha.num_heads)
    k = proj_heads("wk", "bk", mha.num_kv_heads)
    v = proj_heads("wv", "bv", mha.num_kv_heads)
    if mha.rope:
        cos, sin = mha._rope
        q = apply_rope(q, cos, sin, offset=pos)
        k = apply_rope(k, cos, sin, offset=pos)
    scales = {}
    if "k_scale" in pools:       # int8 paged pools
        k, k_sc = kv_quantize(k)
        v, v_sc = kv_quantize(v)
        scales = {
            "k_scale": paged_write_scale(pools["k_scale"],
                                         k_sc[:, :, 0], tables, pos),
            "v_scale": paged_write_scale(pools["v_scale"],
                                         v_sc[:, :, 0], tables, pos)}
    kp, vp = paged_write(pools["k"], pools["v"], k, v, tables, pos)
    new_pools = {"k": kp, "v": vp, **scales}
    # GQA folds query groups against the kv-sized pool (same layout as
    # the contiguous decode path); MHA is the G=1 case of the same form.
    qg = q.reshape(b, mha.num_kv_heads, mha.kv_groups, mha.head_dim)
    o = paged_decode_attention(qg, kp, vp, tables, pos + 1,
                               scale=mha.head_dim ** -0.5, impl=impl,
                               k_scales=scales.get("k_scale"),
                               v_scales=scales.get("v_scale"))
    o2 = o.reshape(b, e).astype(x2.dtype)
    y = _proj(o2, params["wo"], params.get("bo"))
    return y.reshape(b, 1, e), new_pools


def block_apply_decode_paged(blk: TransformerBlock, params, x_t, pools,
                             tables, pos, impl=None):
    a, pools = mha_apply_decode_paged(
        blk.attn, params["attn"], blk.ln1.apply(params["ln1"], x_t),
        pools, tables, pos, impl=impl)
    x_t = x_t + a
    m = blk.mlp.apply(params["mlp"], blk.ln2.apply(params["ln2"], x_t))
    return x_t + m, pools


def mha_init_paged_pool(mha: MultiHeadAttention, n_blocks: int,
                        block_size: int, dtype=jnp.float32,
                        quantized: bool = False):
    shape = (n_blocks, mha.num_kv_heads, block_size, mha.head_dim)
    if quantized:
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def mha_apply_prefill(mha: MultiHeadAttention, params, x, cache):
    """Prompt prefill: one full (flash) attention forward over
    ``x`` [B, P, E] that ALSO fills cache positions [0, P) in a single
    dispatch — a length-P prompt costs one forward instead of P
    sequential decode steps (prompt processing runs at matmul rates,
    decode at matvec/HBM rates).  Returns ``(y [B, P, E], new_cache)``."""
    b, s, e = x.shape
    x2 = x.reshape(b * s, e)

    def heads(w_name, b_name, n_heads):
        y = _proj(x2, params[w_name], params.get(b_name))
        return y.reshape(b, s, n_heads,
                         mha.head_dim).transpose(0, 2, 1, 3)

    q = heads("wq", "bq", mha.num_heads)
    k = heads("wk", "bk", mha.num_kv_heads)
    v = heads("wv", "bv", mha.num_kv_heads)
    if mha.rope:
        cos, sin = mha._rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    # quantized cache: the prefill attention itself still runs on the
    # full-precision K/V from this pass; only the STORED rows are int8.
    # Quantization is per position, so prefill-filled and sequentially-
    # filled caches agree to within one quantization step (not
    # bit-exactly: the one-GEMM prefill projections and the per-step
    # matvecs differ in the last ulp).
    new_cache = _cache_write(cache, k, v, 0,
                             ring=cache["k"].shape[2] < mha.max_seq)
    # GQA: compact K/V go straight through (the flash kernels read them
    # natively; the XLA oracle broadcasts internally)
    o = ops.attention(q, k, v, causal=True, window=mha.window)
    o2 = o.transpose(0, 2, 1, 3).reshape(b * s, e)
    y = _proj(o2, params["wo"], params.get("bo"))
    return y.reshape(b, s, e), new_cache


def mha_apply_chunk(mha: MultiHeadAttention, params, x_c, cache, pos):
    """Chunked decode: ``x_c`` [B, C, E] at positions [pos, pos+C)
    (``pos`` a traced scalar, or a [B] vector — per-row speculative
    verification: row b's chunk starts at its own ``pos[b]``), attending
    the cache through each query's own position.  Writes cache entries
    [pos, pos+C) and returns ``(y [B, C, E], new_cache)``.

    The multi-token cache-backed step speculative decoding's verifier
    needs: the target model scores a γ-token draft in ONE dispatch — a
    skinny [C × S] matmul at prefill-like arithmetic intensity — instead
    of γ sequential matvec decode steps."""
    assert cache["k"].shape[2] >= mha.max_seq, \
        "chunked decode does not support ring (windowed) caches"
    b, c, e = x_c.shape
    x2 = x_c.reshape(b * c, e)

    def heads(w_name, b_name, n_heads):
        y = _proj(x2, params[w_name], params.get(b_name))
        return y.reshape(b, c, n_heads,
                         mha.head_dim).transpose(0, 2, 1, 3)

    q = heads("wq", "bq", mha.num_heads)
    k = heads("wk", "bk", mha.num_kv_heads)
    v = heads("wv", "bv", mha.num_kv_heads)
    if mha.rope:
        cos, sin = mha._rope
        roff = (pos[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :]
                if jnp.ndim(pos) == 1 else pos)
        q = apply_rope(q, cos, sin, offset=roff)
        k = apply_rope(k, cos, sin, offset=roff)
    new_cache = _cache_write(cache, k, v, pos)
    k_cache, v_cache = new_cache["k"], new_cache["v"]
    scales = ({"k_scale": new_cache["k_scale"],
               "v_scale": new_cache["v_scale"]}
              if "k_scale" in new_cache else {})
    offs = jnp.arange(c, dtype=jnp.int32)
    if mha.kv_groups > 1:
        # GQA: fold query groups into the query dim against the kv-sized
        # cache (row r = g*C + c sits at offset c — see tile below).
        qg = q.reshape(b, mha.num_kv_heads, mha.kv_groups, c,
                       mha.head_dim)
        qg = qg.reshape(b, mha.num_kv_heads, mha.kv_groups * c,
                        mha.head_dim)
        o = _decode_attention(qg, k_cache, v_cache, pos,
                              mha.head_dim ** -0.5, mha.window,
                              q_offsets=jnp.tile(offs, mha.kv_groups),
                              **scales)
        o = o.reshape(b, mha.num_kv_heads, mha.kv_groups, c,
                      mha.head_dim)
        o2 = o.transpose(0, 3, 1, 2, 4).reshape(b * c, e)
    else:
        o = _decode_attention(q, k_cache, v_cache, pos,
                              mha.head_dim ** -0.5, mha.window,
                              q_offsets=offs, **scales)
        o2 = o.transpose(0, 2, 1, 3).reshape(b * c, e)
    o2 = o2.astype(x2.dtype)
    y = _proj(o2, params["wo"], params.get("bo"))
    return y.reshape(b, c, e), new_cache


def block_init_cache(blk: TransformerBlock, batch: int, max_seq: int,
                     dtype=jnp.float32, quantized: bool = False,
                     ring: bool = False):
    return mha_init_cache(blk.attn, batch, max_seq, dtype, quantized,
                          ring=ring)


def block_apply_prefill(blk: TransformerBlock, params, x, cache):
    a, cache = mha_apply_prefill(
        blk.attn, params["attn"], blk.ln1.apply(params["ln1"], x), cache)
    x = x + a
    m = blk.mlp.apply(params["mlp"], blk.ln2.apply(params["ln2"], x))
    return x + m, cache


def block_apply_chunk(blk: TransformerBlock, params, x_c, cache, pos):
    a, cache = mha_apply_chunk(
        blk.attn, params["attn"], blk.ln1.apply(params["ln1"], x_c),
        cache, pos)
    x_c = x_c + a
    m = blk.mlp.apply(params["mlp"], blk.ln2.apply(params["ln2"], x_c))
    return x_c + m, cache


def block_apply_decode(blk: TransformerBlock, params, x_t, cache, pos):
    a, cache = mha_apply_decode(
        blk.attn, params["attn"], blk.ln1.apply(params["ln1"], x_t),
        cache, pos)
    x_t = x_t + a
    m = blk.mlp.apply(params["mlp"], blk.ln2.apply(params["ln2"], x_t))
    return x_t + m, cache


# ---------------------------------------------------------------------------
# Rotary position embeddings (RoPE)
# ---------------------------------------------------------------------------

def rope_angles(head_dim: int, max_seq: int, base: float = 10000.0):
    """Precompute cos/sin tables ``[max_seq, head_dim/2]`` (f32)."""
    assert head_dim % 2 == 0, head_dim
    inv = base ** (-jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                   / head_dim)
    t = jnp.arange(max_seq, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.cos(t), jnp.sin(t)


def apply_rope(x, cos, sin, offset=0):
    """Rotate ``x`` [B, H, S, D] by position; ``offset`` shifts the table
    (traced ok — KV-cache decode passes the running position).  A vector
    ``offset`` [B] gives each batch row its own position (ragged decode;
    requires S == 1).  A matrix ``offset`` [B, S] gives every TOKEN its
    own position (packed sequences: positions restart per document)."""
    s, half = x.shape[2], x.shape[3] // 2
    if jnp.ndim(offset) == 2:
        c = jnp.take(cos, offset, axis=0)[:, None]    # [B, 1, S, half]
        si = jnp.take(sin, offset, axis=0)[:, None]
    elif jnp.ndim(offset) == 1:
        assert s == 1, "per-row rope offsets require single-token steps"
        c = jnp.take(cos, offset, axis=0)[:, None, None, :]   # [B,1,1,half]
        si = jnp.take(sin, offset, axis=0)[:, None, None, :]
    else:
        c = jax.lax.dynamic_slice_in_dim(cos, offset, s, 0)[None, None]
        si = jax.lax.dynamic_slice_in_dim(sin, offset, s, 0)[None, None]
    c = c.astype(x.dtype)
    si = si.astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * c - x2 * si, x2 * c + x1 * si], axis=-1)


def apply_rope_bshd(x, cos, sin, n_heads, offset=0):
    """Rotate ``x`` [B, S, H·D] by position — the projection-layout twin
    of :func:`apply_rope` (used by the transpose-free attention path;
    the [B,S,H·D] ↔ [B,S,H,D] reshapes here are contiguous views, not
    copies).  ``offset``: scalar (traced ok) or [B, S] per-token
    positions (packed sequences)."""
    b, s, e = x.shape
    d = e // n_heads
    half = d // 2
    x4 = x.reshape(b, s, n_heads, d)
    if jnp.ndim(offset) == 2:
        c = jnp.take(cos, offset, axis=0)[:, :, None]     # [B, S, 1, half]
        si = jnp.take(sin, offset, axis=0)[:, :, None]
    else:
        assert jnp.ndim(offset) == 0, \
            "per-row [B] offsets are a decode form; use apply_rope"
        c = jax.lax.dynamic_slice_in_dim(cos, offset, s, 0)[None, :, None]
        si = jax.lax.dynamic_slice_in_dim(sin, offset, s, 0)[None, :, None]
    c = c.astype(x.dtype)
    si = si.astype(x.dtype)
    x1, x2 = x4[..., :half], x4[..., half:]
    out = jnp.concatenate([x1 * c - x2 * si, x2 * c + x1 * si], axis=-1)
    return out.reshape(b, s, e)


class MoEMLP(Module):
    """Mixture-of-experts FFN: softmax top-k gating over ``n_experts``
    parallel :class:`MLPBlock`-shaped experts.

    Two dispatch modes:

    * **dense** (``capacity_factor=None``, the oracle): every expert
      runs on every token and non-top-k contributions are zero-weighted
      — no sort/scatter, static shapes, but compute scales with
      ``n_experts`` regardless of ``top_k``.
    * **sparse** (``capacity_factor=f``): GShard-style capacity-based
      routing — each expert processes a static buffer of
      ``C = ceil(top_k·T/n_experts · f)`` tokens gathered by top-k
      assignment (token-order priority; overflow tokens DROP that
      expert's contribution), so expert compute costs ``top_k·f`` dense
      experts' FLOPs instead of ``n_experts``.  All gather/scatter is
      static-shape inside jit.  At large ``f`` (nothing dropped) the
      output equals the dense oracle exactly.

    Expert PARALLELISM divides the expert compute across devices
    (``parallel.expert_parallel_moe``).
    """

    def __init__(self, dim: int, n_experts: int, ratio: int = 4,
                 top_k: int = 2, init_std: float = 0.02,
                 out_init_std: Optional[float] = None,
                 capacity_factor: Optional[float] = None):
        assert 1 <= top_k <= n_experts
        self.dim = dim
        self.n_experts = n_experts
        self.top_k = top_k
        self.capacity_factor = capacity_factor
        self.expert = MLPBlock(dim, ratio=ratio, init_std=init_std,
                               out_init_std=out_init_std)
        self.init_std = init_std

    def init(self, key):
        kg, ke = jax.random.split(key)
        experts = [self.expert.init(k)
                   for k in jax.random.split(ke, self.n_experts)]
        return {
            "gate": jax.random.normal(
                kg, (self.n_experts, self.dim),
                jnp.float32) * self.init_std,
            "experts": jax.tree.map(lambda *xs: jnp.stack(xs), *experts),
        }

    def gates(self, params, x):
        """Top-k-masked, renormalized softmax gates ``[B, S, n_experts]``
        (f32)."""
        logits = jnp.einsum("bse,ne->bsn", x.astype(jnp.float32),
                            params["gate"])
        if self.top_k < self.n_experts:
            # exactly-k selection via top_k indices (a >= kth-value
            # threshold keeps MORE than k experts on ties, e.g. with
            # quantized/degenerate gate inputs)
            _, idx = jax.lax.top_k(logits, self.top_k)
            keep = jnp.any(
                jax.nn.one_hot(idx, self.n_experts, dtype=jnp.bool_),
                axis=-2)
            logits = jnp.where(keep, logits, -jnp.inf)
        return jax.nn.softmax(logits, axis=-1)

    def apply(self, params, x, *, train=False, rng=None):
        if self.capacity_factor is not None:
            return self.apply_sparse(params, x)
        g = self.gates(params, x)
        ye = jax.vmap(lambda p: self.expert.apply(p, x))(
            params["experts"])                     # [n_e, B, S, E]
        y = jnp.einsum("nbse,bsn->bse", ye.astype(jnp.float32), g)
        return y.astype(x.dtype)

    def apply_sparse(self, params, x):
        """Capacity-routed dispatch (see class docstring).

        Token t's slot s (s < top_k) goes to expert ``idx[t, s]`` at the
        position given by its running count within that expert; slots
        past capacity are routed to a trash row and their contribution
        (only) is zeroed — the token's other slots still land.

        Dispatch is formulated as a GATHER via the inverse permutation
        (built with a cheap scalar scatter of slot ids): TPU row
        gathers run near memcpy rate while row scatters serialize, and
        the unavoidable scatter-add then appears only once, in the
        gather's VJP (measured v5e, B8 S2048 dim512 n8k2: 1283 µs vs
        2175 for the row-scatter form; dense-8 3483, ideal-2 794).
        Everything is static-shape and fully differentiable.

        The routing and dispatch math lives in :func:`moe_sparse_routing`
        / :func:`moe_sparse_dispatch`, SHARED with the expert-parallel
        path (``parallel.expert_parallel_moe``) so the two can never
        drift apart — EP equality depends on identical global routing."""
        b, s_len, e = x.shape
        t = b * s_len
        n, k = self.n_experts, self.top_k
        cap = moe_capacity(t, n, k, self.capacity_factor)
        x2 = x.reshape(t, e)
        w, expert, pos, keep = moe_sparse_routing(
            params["gate"], x2, n, k, cap)
        y2 = moe_sparse_dispatch(
            x2, expert, pos, keep, w, cap, n, 0,
            self.expert.apply, params["experts"])
        return y2.reshape(b, s_len, e).astype(x.dtype)


def moe_capacity(t: int, n_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert buffer size ``C = ceil(top_k·T/n · f)``,
    clipped at T (an expert can't see more than every token)."""
    import math as _math

    return min(int(_math.ceil(top_k * t / n_experts * capacity_factor)), t)


def moe_sparse_routing(gate_w, x2, n_experts: int, top_k: int, cap: int):
    """GLOBAL routing decisions for capacity-based sparse MoE dispatch —
    the single source shared by :meth:`MoEMLP.apply_sparse` and the
    expert-parallel path (``parallel.expert_parallel_moe``), which must
    stay bit-identical for EP-vs-single-device equality (identical
    routing → the same slots overflow and drop on every device).

    ``x2``: [T, E] tokens.  Returns ``(w [T, k], expert [T·k],
    pos [T·k], keep [T·k])``: renormalized top-k gate weights, each
    slot's expert id, its position within that expert's buffer
    (exclusive running count in token-major order), and whether it fits
    under ``cap``."""
    t = x2.shape[0]
    logits = jnp.einsum("te,ne->tn", x2.astype(jnp.float32), gate_w)
    top, idx = jax.lax.top_k(logits, top_k)          # [T, k]
    w = jax.nn.softmax(top, axis=-1)                 # == renorm'd gates
    onehot = jax.nn.one_hot(idx.reshape(t * top_k), n_experts,
                            dtype=jnp.int32)
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot,
                  axis=1)                            # [T·k]
    expert = idx.reshape(t * top_k)
    keep = pos < cap
    return w, expert, pos, keep


def moe_sparse_dispatch(x2, expert, pos, mine, w, cap: int,
                        n_local: int, lo: int, expert_apply,
                        experts_params):
    """Inverse-permutation gather dispatch for the expert range
    ``[lo, lo + n_local)`` (the whole model: ``lo=0, n_local=n``; an EP
    device: its local shard): returns this range's weighted
    contributions ``y2 [T, E]`` (f32; other ranges' slots contribute 0,
    so EP devices just psum).  ``mine`` masks the slots this range
    processes (capacity-kept AND expert-owned)."""
    t, e = x2.shape
    tk = expert.shape[0]
    k = tk // t
    dst = jnp.where(mine, (expert - lo) * cap + pos,
                    n_local * cap)                   # trash row
    # inverse permutation: which slot fills buffer position (e, c)?
    slot = jnp.arange(tk, dtype=jnp.int32)
    inv = jnp.full((n_local * cap + 1,), tk, jnp.int32).at[dst].set(
        slot, unique_indices=False)
    tok_idx = jnp.where(inv < tk, inv // k, t)       # sentinel -> 0-row
    x2p = jnp.concatenate([x2, jnp.zeros((1, e), x2.dtype)], axis=0)
    xe = x2p[tok_idx[:n_local * cap]]
    ye = jax.vmap(lambda p, xb: expert_apply(p, xb[None])[0])(
        experts_params, xe.reshape(n_local, cap, e))
    ye_flat = jnp.concatenate(
        [ye.reshape(n_local * cap, e),
         jnp.zeros((1, e), ye.dtype)], axis=0)
    y_slot = ye_flat[dst].astype(jnp.float32)        # dropped → 0
    y_slot = y_slot * jnp.where(mine, w.reshape(tk), 0.0)[:, None]
    return jnp.sum(y_slot.reshape(t, k, e), axis=1)
