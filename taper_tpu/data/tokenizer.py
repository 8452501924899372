"""Byte-level BPE tokenizer (training, encode/decode, save/load).

The reference's data layer stops at MNIST pixels (SURVEY.md §2.9); the
transformer family added here needs a real tokenizer to go beyond
byte-level LMs.  This is minimal byte-pair encoding in the GPT-2
lineage: the base alphabet is all 256 bytes (any input roundtrips —
no OOV, no unicode special-casing), and training greedily merges the
most frequent adjacent pair until ``vocab_size`` is reached.

Pure host-side code by design: tokenization is data-pipeline work that
runs on CPU while the TPU trains (see ``PrefetchLoader``); nothing
here belongs in a jitted program.  Training uses numpy for the pair
counting (the hot loop) — a ~1 MB corpus trains a few hundred merges
in seconds, which is the scale the examples need.
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np


class BPETokenizer:
    """Byte-level BPE. ``merges[k]`` = the pair merged into id ``256+k``."""

    def __init__(self, merges: Sequence[Tuple[int, int]]):
        self.merges: List[Tuple[int, int]] = [tuple(m) for m in merges]
        self.rank: Dict[Tuple[int, int], int] = {
            m: i for i, m in enumerate(self.merges)}
        # id -> raw bytes expansion
        self._bytes: List[bytes] = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            self._bytes.append(self._bytes[a] + self._bytes[b])

    # -- properties ---------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def token_bytes(self, tok_id: int) -> bytes:
        return self._bytes[tok_id]

    # -- training -------------------------------------------------------------

    @classmethod
    def train(cls, corpus: Union[bytes, str], vocab_size: int,
              verbose: bool = False,
              use_native: bool = True) -> "BPETokenizer":
        """Learn ``vocab_size - 256`` merges from ``corpus``.

        With the native library built (``make -C native``) the merge
        loop runs in C++ (``native/bpe.cpp``, exactly equivalent —
        equality-tested); this NumPy path is the fallback/oracle."""
        assert vocab_size >= 256, vocab_size
        if isinstance(corpus, str):
            corpus = corpus.encode("utf-8")
        if use_native:
            from taper_tpu.data import native
            m = native.bpe_train(bytes(corpus), vocab_size - 256)
            if m is not None:
                return cls([(int(a), int(b)) for a, b in m])
        ids = np.frombuffer(corpus, np.uint8).astype(np.int32)
        merges: List[Tuple[int, int]] = []
        for k in range(vocab_size - 256):
            if len(ids) < 2:
                break
            pairs = ids[:-1].astype(np.int64) * (1 << 32) + ids[1:]
            uniq, counts = np.unique(pairs, return_counts=True)
            best = uniq[np.argmax(counts)]
            if counts.max() < 2:
                break
            pair = (int(best >> 32), int(best & 0xFFFFFFFF))
            ids = cls._merge(ids, pair, 256 + k)
            merges.append(pair)
            if verbose and (k + 1) % 64 == 0:
                print(f"  merge {k + 1}: {pair} "
                      f"(corpus {len(ids)} tokens)")
        return cls(merges)

    @staticmethod
    def _merge(ids: np.ndarray, pair: Tuple[int, int],
               new_id: int) -> np.ndarray:
        m = (ids[:-1] == pair[0]) & (ids[1:] == pair[1])
        idx = np.flatnonzero(m)
        if idx.size == 0:
            return ids
        # greedy left-to-right: a match consumes its right neighbor, so
        # overlapping matches (e.g. "aaa" with pair (a,a)) drop
        sel, prev = [], -2
        for i in idx:
            if i > prev + 1:
                sel.append(i)
                prev = i
        sel = np.asarray(sel)
        out = ids.copy()
        out[sel] = new_id
        return np.delete(out, sel + 1)

    # -- encode / decode ------------------------------------------------------

    def encode(self, text: Union[bytes, str],
               use_native: bool = True) -> List[int]:
        """Apply merges in training order (lowest rank first).

        One vectorized :meth:`_merge` pass per rank is equivalent to
        the textbook "repeatedly merge the lowest-rank pair present":
        both tokens of merge ``r``'s pair exist before rank ``r``, and
        a merge can only create adjacencies INVOLVING its new token —
        whose pairs all rank later — so once rank ``r``'s pass is done
        no pair of rank ≤ r can reappear.  The C++ fast path
        (``native/bpe.cpp``) runs the same passes when built."""
        if isinstance(text, str):
            text = text.encode("utf-8")
        if use_native and self.merges:
            from taper_tpu.data import native
            ids = native.bpe_encode(bytes(text),
                                    np.asarray(self.merges, np.int32))
            if ids is not None:
                return ids.tolist()
        ids = np.frombuffer(text, np.uint8).astype(np.int32)
        for r, pair in enumerate(self.merges):
            if len(ids) < 2:
                break
            ids = self._merge(ids, pair, 256 + r)
        return ids.tolist()

    def decode(self, ids: Sequence[int], errors: str = "replace") -> str:
        return b"".join(self._bytes[int(i)]
                        for i in ids).decode("utf-8", errors=errors)

    def decode_bytes(self, ids: Sequence[int]) -> bytes:
        return b"".join(self._bytes[int(i)] for i in ids)

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"format": "taper_tpu-bpe-v1",
                       "merges": self.merges}, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            d = json.load(f)
        assert d.get("format") == "taper_tpu-bpe-v1", d.get("format")
        return cls([tuple(m) for m in d["merges"]])
