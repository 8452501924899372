"""Continuous-batching serving engine for TinyGPT.

The reference has no serving story (SURVEY.md §5.8); this is the
TPU-native production pattern: a FIXED batch of ``slots`` rides one
compiled decode program (static shapes — nothing recompiles as traffic
changes), and requests stream through the slots:

* **admission** — a freed slot's cache is overwritten by a one-row
  prefill of the new prompt (right-padded to ``prompt_pad`` so there is
  exactly ONE prefill program).  Pad positions hold garbage k/v, but
  decode writes position ``pos`` before attending it and never attends
  past ``pos``, so garbage beyond the row's frontier is unreachable —
  the same invariant the ragged-generate path relies on.
* **decode** — ``decode_block`` steps run inside one ``lax.scan``
  dispatch for the WHOLE batch, each row at its own position (the [B]
  position vector the decode path already supports).  Retired rows are
  frozen (position stops advancing) until a new request takes the slot.
* **retirement** — after each block the host scans the (tiny) [K, B]
  token tile for per-row eos / max-new completion and re-admits from
  the queue.  Host work is O(K·B) integers per block; all tensor work
  stays on device.

Per-row outputs are EXACTLY what ``model.generate`` produces for that
request alone (greedy): attention/cache math is row-independent, so
batch composition never changes a row's tokens — the equality the
tests assert.  With ``temperature > 0`` the engine is a valid sampler
but uses its own key stream (no per-request reproducibility contract).
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu.models.transformer import _sample


def _sample_per_row(logits, key, temps, top_ks, top_ps):
    """PER-REQUEST sampling for a slot batch: row b draws at
    ``temps[b]`` with top-k ``top_ks[b]`` (0 = off) and top-p
    ``top_ps[b]`` (1.0 = off); ``temps[b] == 0`` rows take the argmax.
    Vectorized static-shape counterpart of the scalar-config
    ``models.transformer._sample``/``_filter_logits`` (same masking
    semantics: the argmax token always survives the nucleus filter)."""
    v = logits.shape[-1]
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    lt = logits / jnp.maximum(temps, 1e-6)[:, None]
    order = jnp.argsort(-lt, axis=-1)
    ranks = jnp.argsort(order, axis=-1)          # 0 = highest logit
    k_eff = jnp.where(top_ks > 0, top_ks, v)[:, None]
    lt = jnp.where(ranks < k_eff, lt, -jnp.inf)
    sl = jnp.take_along_axis(lt, order, -1)      # sorted desc
    probs = jax.nn.softmax(sl, axis=-1)
    keep = (jnp.cumsum(probs, -1) - probs) < top_ps[:, None]
    keep = keep | (jnp.arange(v)[None, :] == 0)  # argmax always kept
    sl = jnp.where(keep, sl, -jnp.inf)
    lt = jnp.take_along_axis(sl, ranks, -1)
    key, sk = jax.random.split(key)
    sampled = jax.random.categorical(sk, lt).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy), key


def offline_serve(model, params, prompts, lens, max_new, *,
                  slots: int = 8, eos_token: Optional[int] = None,
                  temperature: float = 0.0, top_k=None, top_p=None,
                  quantized_cache: bool = False, key=None,
                  max_out: Optional[int] = None):
    """On-device continuous batching: the ENTIRE scheduler — admission,
    decode, retirement, slot reuse — runs inside one ``lax.while_loop``
    (a single dispatch; zero host round-trips), which is the TPU-native
    form of the host-side :class:`ServingEngine` loop for workloads
    known up front.

    Each loop iteration either ADMITS one queued request into a free
    slot (one-row prefill + cache-row scatter; admission has priority)
    or runs ONE decode step for all slots.  Decode is weight-read-bound,
    so a step costs ~the same at any batch — total iterations scale as
    ``sum(max_new)/slots`` + N admissions, vs a static padded batch's
    ``N`` cache rows all paying ``max(max_new)`` steps.  Continuous
    batching serves the same mixed workload with ``slots`` cache rows
    instead of ``N`` and ~no wasted row-steps.

    Args: ``prompts`` [N, P] right-padded, ``lens`` [N] true lengths,
    ``max_new`` [N] per-request budgets (cap = ``max_out`` or the
    static max).  Returns ``(tokens [N, max_out], n_tokens [N])`` —
    per-request generated tokens (eos included when it fired; positions
    beyond ``n_tokens`` are zeros).  Greedy rows are EXACTLY standalone
    ``generate``'s output; sampling uses one shared key stream.
    """
    n, p_pad = prompts.shape
    m_out = int(max_out if max_out is not None
                else int(np.max(np.asarray(max_new))))
    assert p_pad + m_out <= model.max_seq, (p_pad, m_out, model.max_seq)
    lens = jnp.asarray(lens, jnp.int32)
    max_new = jnp.minimum(jnp.asarray(max_new, jnp.int32), m_out)
    eos = -1 if eos_token is None else int(eos_token)
    if key is None:
        key = jax.random.PRNGKey(0)

    run = _offline_program(model, n, p_pad, slots, m_out, eos,
                           temperature, top_k, top_p, quantized_cache)
    out = run(params, jnp.asarray(prompts, jnp.int32), lens, max_new,
              key)
    if eos_token is None:
        n_tok = max_new
    else:
        hit = out == eos_token
        # tokens beyond budget/eos are zeros already (drop-mode writes)
        first = jnp.where(jnp.any(hit, 1), jnp.argmax(hit, 1) + 1,
                          max_new)
        n_tok = jnp.minimum(first, max_new)
    idx = jnp.arange(m_out)[None, :]
    out = jnp.where(idx < n_tok[:, None], out, 0)
    return out, n_tok


@functools.lru_cache(maxsize=64)
def _offline_program(model, n, p_pad, slots, m_out, eos, temperature,
                     top_k, top_p, quantized_cache):
    """Jitted while_loop scheduler, cached per static configuration so
    repeated :func:`offline_serve` calls reuse the compiled program
    (models hash by identity; the cache holds a strong reference)."""
    b = slots
    sample_kw = dict(temperature=temperature, top_k=top_k, top_p=top_p)

    def run(params, prompts, lens, max_new, key):
        caches = model.init_cache(b, quantized=quantized_cache)
        state = dict(
            next_req=jnp.int32(0),
            slot_rid=jnp.full((b,), n, jnp.int32),   # n == "no request"
            emitted=jnp.zeros((b,), jnp.int32),
            last_tok=jnp.zeros((b,), jnp.int32),
            pos=jnp.zeros((b,), jnp.int32),
            active=jnp.zeros((b,), bool),
            caches=caches,
            out=jnp.zeros((n, m_out), jnp.int32),
            key=key,
        )

        def cond(st):
            return (st["next_req"] < n) | jnp.any(st["active"])

        def admit(st):
            slot = jnp.argmax(~st["active"])         # first free slot
            rid = st["next_req"]
            prompt = jax.lax.dynamic_index_in_dim(prompts, rid, 0)
            c1 = model.init_cache(1, quantized=quantized_cache)
            logits, c1 = model.prefill(params, prompt, c1)
            length = lens[rid]
            lg = jax.lax.dynamic_index_in_dim(logits[0], length - 1, 0,
                                              keepdims=False)
            tok, key = _sample(lg[None], key=st["key"], **sample_kw)
            tok = tok[0]
            caches = jax.tree.map(
                lambda c, x: jax.lax.dynamic_update_index_in_dim(
                    c, x[0], slot, 0), st["caches"], c1)
            live = (tok != eos) & (max_new[rid] > 1)
            return dict(
                next_req=rid + 1,
                slot_rid=st["slot_rid"].at[slot].set(
                    jnp.where(live, rid, n)),
                emitted=st["emitted"].at[slot].set(1),
                last_tok=st["last_tok"].at[slot].set(tok),
                pos=st["pos"].at[slot].set(length),
                active=st["active"].at[slot].set(live),
                caches=caches,
                out=st["out"].at[rid, 0].set(tok),
                key=key,
            )

        def decode(st):
            logits, caches = model.decode_step(
                params, st["last_tok"], st["pos"], st["caches"])
            tok, key = _sample(logits, key=st["key"], **sample_kw)
            tok = jnp.where(st["active"], tok, st["last_tok"])
            emitted = st["emitted"]
            # inactive rows carry slot_rid == n -> the write is dropped
            out = st["out"].at[st["slot_rid"], emitted].set(
                tok, mode="drop")
            emitted = jnp.where(st["active"], emitted + 1, emitted)
            rid_safe = jnp.minimum(st["slot_rid"], n - 1)
            done = st["active"] & ((tok == eos)
                                   | (emitted >= max_new[rid_safe]))
            active = st["active"] & ~done
            return dict(
                next_req=st["next_req"],
                slot_rid=jnp.where(done, n, st["slot_rid"]),
                emitted=emitted,
                last_tok=tok,
                pos=jnp.where(st["active"], st["pos"] + 1, st["pos"]),
                active=active,
                caches=caches,
                out=out,
                key=key,
            )

        def body(st):
            can_admit = (st["next_req"] < n) & jnp.any(~st["active"])
            return jax.lax.cond(can_admit, admit, decode, st)

        st = jax.lax.while_loop(cond, body, state)
        return st["out"]

    return jax.jit(run)


class BlockAllocator:
    """Host-side free list over a paged pool's block ids.

    Allocation/free are pure bookkeeping (device pools are never
    resized); the engine serializes all calls, so no locking."""

    def __init__(self, n_blocks: int):
        self.n_blocks = n_blocks
        self._free = list(range(n_blocks - 1, -1, -1))

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise RuntimeError(
                f"paged pool exhausted: need {n} blocks, "
                f"{len(self._free)}/{self.n_blocks} free")
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, ids) -> None:
        self._free.extend(int(i) for i in ids)


class ServingEngine:
    """Slot-based continuous batching over a TinyGPT-family model.

    ``submit()`` enqueues prompts; ``run()`` drains the queue and
    returns ``{request_id: generated tokens}`` (including the eos
    token when one terminated the row).  ``prompt_pad`` bounds prompt
    length; ``prompt_pad + max_new`` must fit ``model.max_seq``.

    **Paged KV cache** (``pool_blocks=N``): instead of reserving
    ``slots × max_seq`` contiguous cache rows, K/V lives in a shared
    pool of ``N`` blocks of ``block_size`` positions, allocated per
    request by a host-side :class:`BlockAllocator` and addressed
    through per-slot block tables (ops/pallas/paged_attention.py).
    ``paged_impl`` selects the paged decode-attention implementation:
    None → the Pallas kernel (fastest; its MXU dots run single-pass
    bf16, so logits can differ from the contiguous path by ~1e-4 — on a
    trained model a near-tied greedy argmax may flip); ``"xla"`` → the
    gather oracle, numerically matching the contiguous engine
    bit-for-near-bit (the exact-token guarantee the tests assert holds
    on CPU for both, and on TPU for "xla").
    A ``system_prompt`` (paged mode; token list, length a multiple of
    ``block_size``) is prefilled ONCE at engine construction into
    shared prefix blocks that EVERY slot's table aliases — the prefix
    KV is stored once regardless of slot count, admission only
    chunk-prefills each request's own tokens at the offset, and the
    shared blocks are never written (new ranges start on a block
    boundary).  Request prompts are then the per-request continuation.
    Admission reserves ``ceil((len + max_new)/bs)`` blocks — the
    request's true worst case, NOT the ``prompt_pad + max_new`` static
    bucket — so a pool much smaller than ``slots × max_seq`` serves
    mixed-length traffic with a no-mid-decode-OOM guarantee: a request
    is only admitted when its whole reservation fits (blocks written by
    the prefill scatter beyond the reservation are returned to the
    allocator immediately; the slot can never dereference them).
    """

    def __init__(self, model, params, *, slots: int = 8,
                 prompt_pad: int = 64, decode_block: int = 16,
                 eos_token: Optional[int] = None,
                 temperature: float = 0.0, top_k=None, top_p=None,
                 quantized_cache: bool = False, key=None,
                 pool_blocks: Optional[int] = None,
                 block_size: int = 128,
                 system_prompt: Optional[Sequence[int]] = None,
                 paged_impl: Optional[str] = None,
                 lora=None, lora_bank=None):
        self.model = model
        self.params = params
        self.slots = slots
        self.prompt_pad = prompt_pad
        self.decode_block = decode_block
        self.eos_token = eos_token
        self._queue = collections.deque()
        self._next_id = 0
        self._outputs: Dict[int, List[int]] = {}
        self._done_ids: List[int] = []
        # slot -> (request_id, max_new) or None
        self._slot_req: List[Optional[tuple]] = [None] * slots
        self._quant = quantized_cache

        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._paged = pool_blocks is not None
        # multi-tenant LoRA: `lora` is a nn.lora.LoRA instance, `bank`
        # the stack_adapters() tree; submit(..., adapter=k) routes each
        # request through its own adapter inside the shared batch
        assert (lora is None) == (lora_bank is None), \
            "pass lora (LoRA instance) and lora_bank together"
        self._lora, self._bank = lora, lora_bank
        use_lora = lora_bank is not None

        def _wrap_rows(params, bank, row_ids):
            return lora.bank_patch(params, bank, row_ids)
        assert system_prompt is None or self._paged, \
            "system_prompt sharing requires the paged cache " \
            "(pool_blocks=...)"
        assert system_prompt is None or lora_bank is None, \
            "system_prompt + per-request adapters don't compose: the " \
            "shared prefix KV is computed once with the BASE weights, " \
            "but an adapter-k request's prefix KV should use adapter " \
            "k — give adapter traffic its own engine (or prefix)"
        self._prefix_len = 0
        # engine-level sampling config = per-request DEFAULTS; submit()
        # may override any of them per request
        self._default_sampling = (float(temperature),
                                  0 if top_k is None else int(top_k),
                                  1.0 if top_p is None else float(top_p))
        self._temps = np.full((slots,), temperature, np.float32)
        self._topks = np.full((slots,), self._default_sampling[1],
                              np.int32)
        self._topps = np.full((slots,), self._default_sampling[2],
                              np.float32)

        if self._paged:
            bs = block_size
            self._block_size = bs
            self._max_blocks = -(-model.max_seq // bs)
            self._alloc = BlockAllocator(pool_blocks)
            self._slot_blocks: List[List[int]] = [[] for _ in
                                                  range(slots)]
            # host-side tables; pushed to device per call (tiny int32)
            self._tables = np.zeros((slots, self._max_blocks), np.int32)
            self._prefix_len = (0 if system_prompt is None
                                else len(system_prompt))
            assert self._prefix_len % bs == 0, (
                f"system_prompt length ({self._prefix_len}) must be a "
                f"multiple of block_size ({bs}) so shared prefix "
                f"blocks are never written by per-request prefills")
            pref = self._prefix_len

            def admit(params, pools, prompt_1p, length, table_row,
                      slot, last_tok, pos, active, key, temp, topk,
                      topp, *lx):
                """One-row paged prefill of the request's OWN tokens —
                at offset ``pref`` when a shared system prefix exists
                (its blocks are aliased in ``table_row``, read-only)."""
                if use_lora:
                    params = _wrap_rows(
                        params, lx[0],
                        jnp.full((prompt_pad,), lx[1], jnp.int32))
                if pref:
                    logits, pools = model.prefill_paged_continued(
                        params, prompt_1p, pools, table_row[None], pref)
                else:
                    logits, pools = model.prefill_paged(
                        params, prompt_1p, pools, table_row[None])
                lg = jax.lax.dynamic_index_in_dim(
                    logits[0], length - 1, 0, keepdims=False)
                tok, key = _sample_per_row(lg[None], key, temp[None],
                                           topk[None], topp[None])
                return (pools, last_tok.at[slot].set(tok[0]),
                        pos.at[slot].set(pref + length),
                        active.at[slot].set(True), key)

            def decode(params, last_tok, pos, pools, tables, active,
                       key, temps, topks, topps, *lx):
                if use_lora:
                    params = _wrap_rows(params, lx[0], lx[1])
                def step(carry, _):
                    tok, pos, pools, key = carry
                    logits, pools = model.decode_step_paged(
                        params, tok, pos, pools, tables,
                        impl=paged_impl)
                    nxt, key = _sample_per_row(logits, key, temps,
                                               topks, topps)
                    nxt = jnp.where(active, nxt, tok)
                    pos = jnp.where(active, pos + 1, pos)
                    return (nxt, pos, pools, key), nxt

                (tok, pos, pools, key), toks = jax.lax.scan(
                    step, (last_tok, pos, pools, key), None,
                    length=decode_block)
                return tok, pos, pools, key, toks     # toks [K, B]

            self._admit = jax.jit(admit, donate_argnums=(1,))
            self._decode = jax.jit(decode, donate_argnums=(3,))
            self._caches = model.init_paged_cache(
                pool_blocks, bs, quantized=quantized_cache)
            # decode writes K/V for EVERY slot each step (frozen rows
            # rewrite their own last position; idle slots have nothing
            # to own) — idle/retired slots' table rows point at a
            # reserved TRASH block so their writes/reads can never
            # touch a live request's blocks.
            self._trash = self._alloc.alloc(1)[0]
            self._tables[:] = self._trash
            self._prefix_blocks: List[int] = []
            if pref:
                assert pref + prompt_pad <= model.max_seq
                self._prefix_blocks = self._alloc.alloc(pref // bs)
                row = jnp.asarray(self._prefix_blocks, jnp.int32)
                sp = jnp.asarray([list(map(int, system_prompt))],
                                 jnp.int32)
                _, self._caches = jax.jit(
                    lambda p, t, po: model.prefill_paged(
                        p, t, po, row[None]),
                    donate_argnums=(2,))(params, sp, self._caches)
        else:
            def admit(params, caches, prompt_1p, length, slot, last_tok,
                      pos, active, key, temp, topk, topp, *lx):
                """One-row prefill of a padded prompt + scatter into
                `slot`."""
                if use_lora:
                    params = _wrap_rows(
                        params, lx[0],
                        jnp.full((prompt_pad,), lx[1], jnp.int32))
                c1 = model.init_cache(1, quantized=quantized_cache)
                logits, c1 = model.prefill(params, prompt_1p, c1)
                lg = jax.lax.dynamic_index_in_dim(logits[0], length - 1,
                                                  0, keepdims=False)
                tok, key = _sample_per_row(lg[None], key, temp[None],
                                           topk[None], topp[None])
                caches = jax.tree.map(
                    lambda c, x: jax.lax.dynamic_update_index_in_dim(
                        c, x[0], slot, 0), caches, c1)
                return (caches, last_tok.at[slot].set(tok[0]),
                        pos.at[slot].set(length),
                        active.at[slot].set(True), key)

            def decode(params, last_tok, pos, caches, active, key,
                       temps, topks, topps, *lx):
                """``decode_block`` steps for all slots; frozen rows
                hold."""
                if use_lora:
                    params = _wrap_rows(params, lx[0], lx[1])
                def step(carry, _):
                    tok, pos, caches, key = carry
                    logits, caches = model.decode_step(params, tok, pos,
                                                       caches)
                    nxt, key = _sample_per_row(logits, key, temps,
                                               topks, topps)
                    nxt = jnp.where(active, nxt, tok)
                    pos = jnp.where(active, pos + 1, pos)
                    return (nxt, pos, caches, key), nxt

                (tok, pos, caches, key), toks = jax.lax.scan(
                    step, (last_tok, pos, caches, key), None,
                    length=decode_block)
                return tok, pos, caches, key, toks        # toks [K, B]

            self._admit = jax.jit(admit, donate_argnums=(1,))
            self._decode = jax.jit(decode, donate_argnums=(3,))
            self._caches = model.init_cache(slots,
                                            quantized=quantized_cache)
        self._last_tok = jnp.zeros((slots,), jnp.int32)
        self._pos = jnp.zeros((slots,), jnp.int32)
        self._active = jnp.zeros((slots,), bool)
        # host mirror of how many tokens each slot has emitted
        self._emitted = [0] * slots
        self._stats = {"admitted": 0, "completed": 0,
                       "decode_blocks": 0, "tokens_emitted": 0,
                       "admission_deferrals": 0}
        self._adapters = np.full((slots,), -1, np.int32)

    def _lora_extras(self, ids):
        return (self._bank, ids) if self._bank is not None else ()

    def stats(self):
        """Engine observability snapshot (host counters only — no
        device sync): request lifecycle counts, live slot/queue
        occupancy, and (paged) pool occupancy."""
        out = dict(self._stats)
        out["queued"] = len(self._queue)
        out["active_slots"] = sum(r is not None for r in self._slot_req)
        out["slots"] = self.slots
        if self._paged:
            out["pool_blocks_total"] = (self._alloc.n_blocks - 1
                                        - len(self._prefix_blocks))
            out["pool_blocks_free"] = self._alloc.available
        return out

    # -- request lifecycle --------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new: int,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               adapter: Optional[int] = None) -> int:
        """Enqueue one request.  ``temperature``/``top_k``/``top_p``
        override the engine defaults FOR THIS REQUEST (rows in the same
        decode batch sample independently — greedy and sampled requests
        mix freely).  ``adapter`` selects this request's LoRA adapter
        from the engine's bank (None = base model) — multi-tenant
        serving in one shared decode batch."""
        assert 1 <= len(prompt) <= self.prompt_pad, len(prompt)
        assert (self._prefix_len + self.prompt_pad + max_new
                <= self.model.max_seq)
        if self._paged:
            _, _, need = self._paged_need(len(prompt), int(max_new))
            usable = (self._alloc.n_blocks - 1
                      - len(self._prefix_blocks))
            assert need <= usable, (
                f"request needs {need} blocks but the pool only has "
                f"{usable} usable (trash + shared prefix reserved) — "
                f"it could never be admitted")
        rid = self._next_id
        self._next_id += 1
        dt, dk, dp = self._default_sampling
        samp = (dt if temperature is None else float(temperature),
                dk if top_k is None else int(top_k),
                dp if top_p is None else float(top_p))
        if adapter is not None:
            assert self._bank is not None, \
                "submit(adapter=...) needs lora/lora_bank at init"
        self._queue.append((rid, list(map(int, prompt)), int(max_new),
                            samp, -1 if adapter is None else
                            int(adapter)))
        return rid

    def _free_slots(self):
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _paged_need(self, prompt_len: int, max_new: int):
        """(scatter, keep, alloc) NEW-block counts for one admission
        (beyond any shared prefix blocks): the prefill scatters
        ceil(prompt_pad/bs) blocks past the prefix (static program),
        the request only ever dereferences what covers
        prefix + len + max_new."""
        bs, pref = self._block_size, self._prefix_len
        nbp = pref // bs
        scatter = -(-(pref + self.prompt_pad) // bs) - nbp
        keep = -(-(pref + prompt_len + max_new) // bs) - nbp
        return scatter, keep, max(scatter, keep)

    def _admit_one(self, slot: int) -> bool:
        if self._paged:
            _, _, need = self._paged_need(len(self._queue[0][1]),
                                          self._queue[0][2])
            if need > self._alloc.available:
                self._stats["admission_deferrals"] += 1
                return False          # FCFS: wait for blocks to free
        (rid, prompt, max_new, (temp, topk, topp),
         adapter) = self._queue.popleft()
        self._adapters[slot] = adapter
        self._temps[slot] = temp
        self._topks[slot] = topk
        self._topps[slot] = topp
        samp = (jnp.float32(temp), jnp.int32(topk), jnp.float32(topp))
        padded = np.zeros((1, self.prompt_pad), np.int32)
        padded[0, :len(prompt)] = prompt
        if self._paged:
            _, keep, need = self._paged_need(len(prompt), max_new)
            nbp = self._prefix_len // self._block_size
            ids = self._alloc.alloc(need)
            row = np.full((self._max_blocks,), self._trash, np.int32)
            row[:nbp] = self._prefix_blocks       # shared, read-only
            row[nbp:nbp + need] = ids
            self._tables[slot] = row
            (self._caches, self._last_tok, self._pos, self._active,
             self._key) = self._admit(
                self.params, self._caches, jnp.asarray(padded),
                jnp.int32(len(prompt)), jnp.asarray(row),
                jnp.int32(slot), self._last_tok, self._pos,
                self._active, self._key, *samp, *self._lora_extras(
                    jnp.int32(adapter)))
            if need > keep:   # prompt-pad scatter overshoot: return it
                self._alloc.free(ids[keep:])
                self._tables[slot, nbp + keep:] = self._trash
            self._slot_blocks[slot] = ids[:keep]
        else:
            (self._caches, self._last_tok, self._pos, self._active,
             self._key) = self._admit(
                self.params, self._caches, jnp.asarray(padded),
                jnp.int32(len(prompt)), jnp.int32(slot), self._last_tok,
                self._pos, self._active, self._key, *samp,
                *self._lora_extras(jnp.int32(adapter)))
        self._slot_req[slot] = (rid, max_new)
        self._stats["admitted"] += 1
        self._stats["tokens_emitted"] += 1
        self._emitted[slot] = 1          # prefill sampled the first token
        # fetch the first token NOW (one small device->host sync per
        # admission): retirement must see it before the next decode
        # block in case max_new == 1 or it already hit eos — otherwise
        # the slot would decode past its budget
        first = int(np.asarray(self._last_tok)[slot])
        self._outputs[rid] = [first]
        self._maybe_retire(slot, first)
        return True

    def _maybe_retire(self, slot: int, tok: int):
        rid, max_new = self._slot_req[slot]
        done = (self.eos_token is not None and tok == self.eos_token) \
            or self._emitted[slot] >= max_new
        if done:
            self._slot_req[slot] = None
            self._active = self._active.at[slot].set(False)
            self._done_ids.append(rid)
            self._adapters[slot] = -1
            self._stats["completed"] += 1
            if self._paged:
                self._alloc.free(self._slot_blocks[slot])
                self._slot_blocks[slot] = []
                self._tables[slot, :] = self._trash

    def step(self):
        """One scheduling round: admit into free slots, then one decode
        block; returns True while work remains."""
        for slot in self._free_slots():
            if not self._queue:
                break
            if not self._admit_one(slot):
                break                 # paged pool full: decode first
        if not any(r is not None for r in self._slot_req):
            return bool(self._queue)

        self._stats["decode_blocks"] += 1
        samp = (jnp.asarray(self._temps), jnp.asarray(self._topks),
                jnp.asarray(self._topps))
        if self._paged:
            (self._last_tok, self._pos, self._caches, self._key,
             toks) = self._decode(self.params, self._last_tok,
                                  self._pos, self._caches,
                                  jnp.asarray(self._tables),
                                  self._active, self._key, *samp,
                                  *self._lora_extras(
                                      jnp.asarray(self._adapters)))
        else:
            (self._last_tok, self._pos, self._caches, self._key,
             toks) = self._decode(self.params, self._last_tok,
                                  self._pos, self._caches,
                                  self._active, self._key, *samp,
                                  *self._lora_extras(
                                      jnp.asarray(self._adapters)))
        tile = np.asarray(toks)                       # [K, B] small
        for slot, req in enumerate(self._slot_req):
            if req is None:
                continue
            rid, max_new = req
            for k in range(tile.shape[0]):
                if self._slot_req[slot] is None:
                    break
                t = int(tile[k, slot])
                self._outputs[rid].append(t)
                self._emitted[slot] += 1
                self._stats["tokens_emitted"] += 1
                self._maybe_retire(slot, t)
        return bool(self._queue) or any(r is not None
                                        for r in self._slot_req)

    def run(self) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {request_id: generated tokens}
        for the requests COMPLETED by this call (earlier runs' results
        were already handed out — the engine holds no history, so a
        long-lived instance doesn't grow without bound)."""
        while self.step():
            pass
        done, self._done_ids = self._done_ids, []
        return {rid: self._outputs.pop(rid) for rid in done}
