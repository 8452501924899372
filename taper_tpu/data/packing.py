"""Sequence packing for LM training (beyond-reference scope — the
reference has no sequence models at all, SURVEY.md §5.7).

Variable-length documents waste most of a padded batch: at a typical
web-corpus length distribution, right-padding to ``seq_len`` burns the
majority of every batch's FLOPs on pad tokens.  Packing concatenates
documents back-to-back into full rows and keeps them independent with:

* ``segment_ids`` [B, S] — 1-based document id per token (0 = padding);
  attention masks to same-id keys (``ops.attention(segment_ids=...)``,
  supported by BOTH the XLA oracle and the flash kernel's fwd+bwd).
* ``positions`` [B, S] — intra-document position, restarting at 0 per
  document; drives RoPE / learned positional lookups so each document
  sees positions exactly as it would alone.
* ``targets``/``loss_mask`` — next-token targets WITHIN each document;
  the last token of every document (nothing to predict) and all pad
  positions are mask=0, so no loss ever crosses a document boundary.

The packer is greedy first-fit over the docs in order (deterministic);
documents longer than ``seq_len`` are SPLIT into ``seq_len``-sized
chunks, each its own segment (standard practice — a split chunk trains
without its left context, which is the price of fixed shapes).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

__all__ = ["pack_documents", "packing_efficiency"]


def pack_documents(docs: Sequence[Sequence[int]], seq_len: int,
                   pad_id: int = 0):
    """Pack token documents into fixed ``[B, seq_len]`` training rows.

    Returns a dict of int32 numpy arrays, all ``[B, seq_len]``:
    ``tokens``, ``targets``, ``segment_ids`` (1-based, 0 = pad),
    ``positions`` and ``loss_mask`` (f32).  Feed to
    ``TinyGPT.loss(tokens, targets, loss_mask, segment_ids=...,
    positions=...)``.
    """
    assert seq_len >= 2, seq_len
    chunks: List[List[int]] = []
    for doc in docs:
        doc = list(doc)
        if not doc:
            continue
        for i in range(0, len(doc), seq_len):
            chunks.append(doc[i:i + seq_len])

    rows: List[List[List[int]]] = []      # row -> list of chunks
    fill: List[int] = []
    for ch in chunks:                      # greedy first-fit
        for r, used in enumerate(fill):
            if used + len(ch) <= seq_len:
                rows[r].append(ch)
                fill[r] += len(ch)
                break
        else:
            rows.append([ch])
            fill.append(len(ch))

    b = len(rows)
    tokens = np.full((b, seq_len), pad_id, np.int32)
    targets = np.full((b, seq_len), pad_id, np.int32)
    seg = np.zeros((b, seq_len), np.int32)
    pos = np.zeros((b, seq_len), np.int32)
    mask = np.zeros((b, seq_len), np.float32)
    for r, row in enumerate(rows):
        at = 0
        for s_id, ch in enumerate(row, start=1):
            n = len(ch)
            tokens[r, at:at + n] = ch
            seg[r, at:at + n] = s_id
            pos[r, at:at + n] = np.arange(n)
            if n > 1:
                targets[r, at:at + n - 1] = ch[1:]
                mask[r, at:at + n - 1] = 1.0
            at += n
    return {"tokens": tokens, "targets": targets, "segment_ids": seg,
            "positions": pos, "loss_mask": mask}


def packing_efficiency(packed) -> float:
    """Fraction of token slots carrying real (non-pad) tokens."""
    seg = packed["segment_ids"]
    return float((seg > 0).mean())
