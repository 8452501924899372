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
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu.models.transformer import _sample


class ServingEngine:
    """Slot-based continuous batching over a TinyGPT-family model.

    ``submit()`` enqueues prompts; ``run()`` drains the queue and
    returns ``{request_id: generated tokens}`` (including the eos
    token when one terminated the row).  ``prompt_pad`` bounds prompt
    length; ``prompt_pad + max_new`` must fit ``model.max_seq``.
    """

    def __init__(self, model, params, *, slots: int = 8,
                 prompt_pad: int = 64, decode_block: int = 16,
                 eos_token: Optional[int] = None,
                 temperature: float = 0.0, top_k=None, top_p=None,
                 quantized_cache: bool = False, key=None):
        self.model = model
        self.params = params
        self.slots = slots
        self.prompt_pad = prompt_pad
        self.decode_block = decode_block
        self.eos_token = eos_token
        self._queue = collections.deque()
        self._next_id = 0
        self._outputs: Dict[int, List[int]] = {}
        # slot -> (request_id, max_new) or None
        self._slot_req: List[Optional[tuple]] = [None] * slots
        self._quant = quantized_cache

        sample_kw = dict(temperature=temperature, top_k=top_k,
                         top_p=top_p)
        self._key = key if key is not None else jax.random.PRNGKey(0)

        def admit(params, caches, prompt_1p, length, slot, last_tok,
                  pos, active, key):
            """One-row prefill of a padded prompt + scatter into `slot`."""
            c1 = model.init_cache(1, quantized=quantized_cache)
            logits, c1 = model.prefill(params, prompt_1p, c1)
            lg = jax.lax.dynamic_index_in_dim(logits[0], length - 1, 0,
                                              keepdims=False)
            tok, key = _sample(lg[None], key, **sample_kw)
            caches = jax.tree.map(
                lambda c, x: jax.lax.dynamic_update_index_in_dim(
                    c, x[0], slot, 0), caches, c1)
            return (caches, last_tok.at[slot].set(tok[0]),
                    pos.at[slot].set(length), active.at[slot].set(True),
                    key)

        def decode(params, last_tok, pos, caches, active, key):
            """``decode_block`` steps for all slots; frozen rows hold."""
            def step(carry, _):
                tok, pos, caches, key = carry
                logits, caches = model.decode_step(params, tok, pos,
                                                   caches)
                nxt, key = _sample(logits, key, **sample_kw)
                nxt = jnp.where(active, nxt, tok)
                pos = jnp.where(active, pos + 1, pos)
                return (nxt, pos, caches, key), nxt

            (tok, pos, caches, key), toks = jax.lax.scan(
                step, (last_tok, pos, caches, key), None,
                length=decode_block)
            return tok, pos, caches, key, toks        # toks [K, B]

        self._admit = jax.jit(admit, donate_argnums=(1,))
        self._decode = jax.jit(decode, donate_argnums=(3,))

        self._caches = model.init_cache(slots, quantized=quantized_cache)
        self._last_tok = jnp.zeros((slots,), jnp.int32)
        self._pos = jnp.zeros((slots,), jnp.int32)
        self._active = jnp.zeros((slots,), bool)
        # host mirror of how many tokens each slot has emitted
        self._emitted = [0] * slots

    # -- request lifecycle --------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new: int) -> int:
        assert 1 <= len(prompt) <= self.prompt_pad, len(prompt)
        assert self.prompt_pad + max_new <= self.model.max_seq
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, list(map(int, prompt)), int(max_new)))
        return rid

    def _free_slots(self):
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _admit_one(self, slot: int):
        rid, prompt, max_new = self._queue.popleft()
        padded = np.zeros((1, self.prompt_pad), np.int32)
        padded[0, :len(prompt)] = prompt
        (self._caches, self._last_tok, self._pos, self._active,
         self._key) = self._admit(
            self.params, self._caches, jnp.asarray(padded),
            jnp.int32(len(prompt)), jnp.int32(slot), self._last_tok,
            self._pos, self._active, self._key)
        self._slot_req[slot] = (rid, max_new)
        self._emitted[slot] = 1          # prefill sampled the first token
        # the first token is on device in last_tok; harvest lazily with
        # the next decode block (or immediately if max_new == 1)
        first = int(np.asarray(self._last_tok)[slot])
        self._outputs[rid] = [first]
        self._maybe_retire(slot, first)

    def _maybe_retire(self, slot: int, tok: int):
        rid, max_new = self._slot_req[slot]
        done = (self.eos_token is not None and tok == self.eos_token) \
            or self._emitted[slot] >= max_new
        if done:
            self._slot_req[slot] = None
            self._active = self._active.at[slot].set(False)

    def step(self):
        """One scheduling round: admit into free slots, then one decode
        block; returns True while work remains."""
        for slot in self._free_slots():
            if not self._queue:
                break
            self._admit_one(slot)
        if not any(r is not None for r in self._slot_req):
            return bool(self._queue)

        (self._last_tok, self._pos, self._caches, self._key,
         toks) = self._decode(self.params, self._last_tok, self._pos,
                              self._caches, self._active, self._key)
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
                self._maybe_retire(slot, t)
        return bool(self._queue) or any(r is not None
                                        for r in self._slot_req)

    def run(self) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {request_id: generated tokens}."""
        while self.step():
            pass
        return self._outputs
