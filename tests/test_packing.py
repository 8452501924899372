"""Packed-sequence training: segment-masked attention (both backends,
fwd + grads), per-token RoPE positions, and the packer itself.

The load-bearing equality: a document packed WITH OTHERS into one row
produces exactly the logits it gets when run alone.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taper_tpu import models, ops
from taper_tpu.data.packing import pack_documents, packing_efficiency


def test_pack_documents_layout():
    docs = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11] * 12]
    p = pack_documents(docs, seq_len=8)
    tokens, seg, pos = p["tokens"], p["segment_ids"], p["positions"]
    mask, tgt = p["loss_mask"], p["targets"]
    # doc 3 (len 12) splits into a full row chunk + len-4 chunk
    assert tokens.shape[1] == 8
    # every non-pad position has a 1-based segment id and intra-doc pos
    for r in range(tokens.shape[0]):
        for c in range(8):
            if seg[r, c] == 0:
                assert mask[r, c] == 0
            else:
                if c > 0 and seg[r, c] == seg[r, c - 1]:
                    assert pos[r, c] == pos[r, c - 1] + 1
                else:
                    assert pos[r, c] == 0
    # targets are the next token within the same segment, mask bounds it
    rr, cc = np.nonzero(mask)
    for r, c in zip(rr, cc):
        assert seg[r, c + 1] == seg[r, c]
        assert tgt[r, c] == tokens[r, c + 1]
    # last token of every segment contributes no loss
    for r in range(tokens.shape[0]):
        for c in range(8):
            if seg[r, c] != 0 and (c == 7 or seg[r, c + 1] != seg[r, c]):
                assert mask[r, c] == 0
    assert 0.5 < packing_efficiency(p) <= 1.0


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_packed_forward_equals_per_doc_forward(backend):
    """Two docs packed into one row == each doc run alone (logits at
    the doc's positions), rope positions restarting per doc."""
    ops.set_backend(backend)
    try:
        model = models.TinyGPT(vocab_size=37, dim=32, depth=2,
                               num_heads=4, max_seq=256, rope=True)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        d1 = list(rng.integers(1, 37, 5))
        d2 = list(rng.integers(1, 37, 7))
        p = pack_documents([d1, d2], seq_len=16)
        packed_logits = model.apply(
            params, jnp.asarray(p["tokens"]),
            segment_ids=jnp.asarray(p["segment_ids"]),
            positions=jnp.asarray(p["positions"]))
        for doc, start in ((d1, 0), (d2, 5)):
            alone = model.apply(params,
                                jnp.asarray([doc], jnp.int32))
            got = packed_logits[0, start:start + len(doc)]
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(alone[0]),
                                       rtol=2e-4, atol=2e-4)
    finally:
        ops.set_backend("xla")


def test_flash_segment_kernel_matches_oracle_with_grads():
    """ops.attention(segment_ids=...) — pallas flash kernel vs XLA
    oracle at a kernel-eligible size, values AND all three grads."""
    import os
    b, h, s, d = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    seg = jnp.cumsum(jax.random.bernoulli(
        ks[3], 0.03, (b, s)).astype(jnp.int32), axis=1)
    os.environ["TAPER_FLASH_MIN"] = "128"
    try:
        for causal in (True, False):
            def f(q, k, v, be):
                with ops.use_backend(be):
                    o = ops.attention(q, k, v, causal=causal,
                                      segment_ids=seg)
                return jnp.sum(o ** 2), o

            (_, o_x), g_x = jax.value_and_grad(
                lambda *a: f(*a, "xla"), argnums=(0, 1, 2),
                has_aux=True)(q, k, v)
            (_, o_p), g_p = jax.value_and_grad(
                lambda *a: f(*a, "pallas"), argnums=(0, 1, 2),
                has_aux=True)(q, k, v)
            np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                                       rtol=1e-5, atol=1e-5)
            for a, b_ in zip(g_p, g_x):
                np.testing.assert_allclose(np.asarray(a),
                                           np.asarray(b_),
                                           rtol=1e-4, atol=1e-4)
    finally:
        os.environ.pop("TAPER_FLASH_MIN", None)


def test_packed_training_step_runs_and_masks_loss():
    """TinyGPT.loss over a packed batch: finite, and pad/garbage tokens
    provably cannot influence it (poison the pad slots)."""
    model = models.TinyGPT(vocab_size=37, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    docs = [list(rng.integers(1, 37, int(n)))
            for n in rng.integers(3, 14, 9)]
    p = pack_documents(docs, seq_len=32)

    def run(tokens):
        return model.loss(params, jnp.asarray(tokens),
                          jnp.asarray(p["targets"]),
                          jnp.asarray(p["loss_mask"]),
                          segment_ids=jnp.asarray(p["segment_ids"]),
                          positions=jnp.asarray(p["positions"]))[0]

    base = float(run(p["tokens"]))
    assert np.isfinite(base)
    poisoned = p["tokens"].copy()
    poisoned[p["segment_ids"] == 0] = 36     # garbage in the pad slots
    assert float(run(poisoned)) == base
    g = jax.grad(lambda pa: model.loss(
        pa, jnp.asarray(p["tokens"]), jnp.asarray(p["targets"]),
        jnp.asarray(p["loss_mask"]),
        segment_ids=jnp.asarray(p["segment_ids"]),
        positions=jnp.asarray(p["positions"]))[0])(params)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree.leaves(g))
