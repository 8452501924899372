"""Synthetic sequence tasks for the transformer family (on-device).

Zero-egress environment: like the vision datasets (``mnist.py`` renders
deterministic glyphs), sequence data is generated, not downloaded.  The
sort task is generated *inside jit* with ``jax.random`` — the whole
training step, data included, compiles to one XLA program with no host
round-trip (the TPU-first answer to a host-side DataLoader for synthetic
tasks).

Sort task (a standard seq2seq probe the model cannot shortcut):
  tokens = [BOS] d_1 .. d_L [SEP] s_1 .. s_L
where d are i.i.d. uniform digits and s = sorted(d).  Next-token
prediction is supervised only where the target is part of the sorted
segment — predicting digits from thin air is noise, copying-sorted is
the learned skill (it requires content-based attention over the full
prefix, so accuracy ≈ 1/base until attention works).

Sequence length is ``2L + 2``; pick ``L = 63`` for the lane-aligned
S = 128 that the flash-attention kernel wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_task_vocab(base: int = 10) -> int:
    """Digits 0..base-1, SEP = base, BOS = base+1."""
    return base + 2


def sort_task_batch(key, batch: int, length: int, base: int = 10,
                    descending: bool = False):
    """Returns ``(tokens [B, S], targets [B, S], mask [S])`` with
    ``S = 2·length + 2``; jit-safe (shapes static in ``batch``/``length``).

    ``targets[:, j] = tokens[:, j+1]`` (last position padded with BOS and
    masked out); ``mask[j] = 1`` iff the target at ``j`` is a sorted-segment
    digit.  ``descending=True`` reverses the sorted segment — the
    fine-tuning "task shift" used by ``examples/lora_finetune.py``.
    """
    sep = jnp.int32(base)
    bos = jnp.int32(base + 1)
    digits = jax.random.randint(key, (batch, length), 0, base, jnp.int32)
    s = jnp.sort(digits, axis=1)
    if descending:
        s = s[:, ::-1]
    tokens = jnp.concatenate([
        jnp.full((batch, 1), bos),
        digits,
        jnp.full((batch, 1), sep),
        s,
    ], axis=1)
    targets = jnp.concatenate(
        [tokens[:, 1:], jnp.full((batch, 1), bos)], axis=1)
    pos = jnp.arange(2 * length + 2)
    # sorted-segment targets live at positions length+1 .. 2·length
    mask = ((pos >= length + 1) & (pos <= 2 * length)).astype(jnp.float32)
    return tokens, targets, mask


def masked_token_loss(logits, targets, mask, z_loss: float = 0.0):
    """Mean next-token CE over masked positions.

    ``logits [B, S, V]``, ``targets [B, S]`` int, ``mask [S]`` or
    ``[B, S]`` float.  Returns ``(loss, accuracy)`` over the masked set.

    ``z_loss > 0`` adds the PaLM-style logit regularizer
    ``z_loss · mean(logsumexp(logits)²)`` over the masked positions —
    keeps the softmax normalizer Z near 1 so logits don't drift (large-
    scale LM training stability; bf16 benefits most).
    """
    lf = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lf, axis=-1)
    nll = lse - jnp.take_along_axis(lf, targets[..., None],
                                    axis=-1)[..., 0]
    m = jnp.broadcast_to(mask, nll.shape)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    loss = jnp.sum(nll * m) / denom
    if z_loss:
        loss = loss + z_loss * jnp.sum(lse * lse * m) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == targets) * m) / denom
    return loss, acc
