"""Model-level paged KV-cache decode (TinyGPT.decode_step_paged /
prefill_paged) against the contiguous-cache oracle, token for token,
over fragmented block tables."""

import numpy as np
import jax
import jax.numpy as jnp

from taper_tpu import models, ops


def _model(**kw):
    ops.set_backend("xla")
    cfg = dict(vocab_size=61, dim=64, depth=2, num_heads=4, max_seq=128,
               rope=True)
    cfg.update(kw)
    m = models.TinyGPT(**cfg)
    return m, m.init(jax.random.PRNGKey(0))


def _fragmented_tables(key, b, mb, n_blocks):
    perm = np.asarray(jax.random.permutation(key, n_blocks))
    return jnp.asarray(perm[:b * mb].reshape(b, mb), jnp.int32)


def _run_both(model, params, prompt, steps, bs=8):
    """Greedy decode `steps` tokens on the contiguous and paged paths;
    returns (tokens_contig, tokens_paged, max logit diff)."""
    b, p = prompt.shape
    mb = -(-(p + steps) // bs)
    n_blocks = b * mb + 2
    tables = _fragmented_tables(jax.random.PRNGKey(9), b, mb, n_blocks)

    caches = model.init_cache(b)
    lg_c, caches = model.prefill(params, prompt, caches)
    pools = model.init_paged_cache(n_blocks, block_size=bs)
    lg_p, pools = model.prefill_paged(params, prompt, pools, tables)
    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_c),
                               rtol=2e-5, atol=2e-5)

    tok_c = jnp.argmax(lg_c[:, -1], axis=-1).astype(jnp.int32)
    tok_p = jnp.argmax(lg_p[:, -1], axis=-1).astype(jnp.int32)
    outs_c, outs_p, max_diff = [tok_c], [tok_p], 0.0
    pos = jnp.full((b,), p, jnp.int32)
    for _ in range(steps):
        lc, caches = model.decode_step(params, tok_c, pos, caches)
        lp, pools = model.decode_step_paged(params, tok_p, pos, pools,
                                            tables)
        max_diff = max(max_diff,
                       float(jnp.max(jnp.abs(lc - lp))))
        tok_c = jnp.argmax(lc, axis=-1).astype(jnp.int32)
        tok_p = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        outs_c.append(tok_c)
        outs_p.append(tok_p)
        pos = pos + 1
    return (np.stack([np.asarray(t) for t in outs_c], 1),
            np.stack([np.asarray(t) for t in outs_p], 1), max_diff)


def test_paged_decode_matches_contiguous_mha():
    model, params = _model()
    prompt = jax.random.randint(jax.random.PRNGKey(1), (3, 12), 0, 61)
    tc, tp, diff = _run_both(model, params, prompt, steps=7)
    np.testing.assert_array_equal(tp, tc)
    assert diff < 2e-4, diff


def test_paged_decode_matches_contiguous_gqa():
    model, params = _model(num_heads=4, num_kv_heads=2)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 9), 0, 61)
    tc, tp, diff = _run_both(model, params, prompt, steps=8)
    np.testing.assert_array_equal(tp, tc)
    assert diff < 2e-4, diff


def test_paged_quantized_matches_contiguous_quantized():
    """int8 paged pools vs the contiguous int8 cache: both quantize
    identically per position, so greedy tokens must agree."""
    model, params = _model()
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 11), 0, 61)
    b, p = prompt.shape
    steps, bs = 6, 8
    mb = -(-(p + steps) // bs)
    n_blocks = b * mb + 2
    tables = _fragmented_tables(jax.random.PRNGKey(5), b, mb, n_blocks)

    caches = model.init_cache(b, quantized=True)
    lg_c, caches = model.prefill(params, prompt, caches)
    pools = model.init_paged_cache(n_blocks, block_size=bs,
                                   quantized=True)
    assert pools[0]["k"].dtype == jnp.int8
    lg_p, pools = model.prefill_paged(params, prompt, pools, tables)
    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_c),
                               rtol=2e-5, atol=2e-5)
    tok_c = jnp.argmax(lg_c[:, -1], -1).astype(jnp.int32)
    tok_p = jnp.argmax(lg_p[:, -1], -1).astype(jnp.int32)
    pos = jnp.full((b,), p, jnp.int32)
    for _ in range(steps):
        lc, caches = model.decode_step(params, tok_c, pos, caches)
        lp, pools = model.decode_step_paged(params, tok_p, pos, pools,
                                            tables)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lc),
                                   rtol=2e-4, atol=2e-4)
        tok_c = jnp.argmax(lc, -1).astype(jnp.int32)
        tok_p = jnp.argmax(lp, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok_p),
                                      np.asarray(tok_c))
        pos = pos + 1


def test_paged_shared_prefix_chunk_prefill():
    """Two slots ALIAS the same prefix blocks (system prompt stored
    once); each chunk-prefills its own continuation at the offset and
    decodes — logits must equal the plain full-prompt path, and the
    shared blocks must remain byte-identical (never written)."""
    model, params = _model()
    bs = 8
    prefix = jax.random.randint(jax.random.PRNGKey(10), (1, 2 * bs),
                                0, 61)                  # block-aligned
    conts = [jax.random.randint(jax.random.PRNGKey(11 + i), (1, 5),
                                0, 61) for i in range(2)]
    plen = prefix.shape[1]
    steps = 4
    mb = -(-(plen + 5 + steps) // bs)
    n_blocks = 2 + 2 * (mb - 2) + 3
    pools = model.init_paged_cache(n_blocks, block_size=bs)
    prefix_blocks = jnp.asarray([1, 2], jnp.int32)
    _, pools = model.prefill_paged(params, prefix, pools,
                                   prefix_blocks[None])
    shared_before = np.asarray(pools[0]["k"][1:3]).copy()

    tables = np.zeros((2, mb), np.int32)
    nxt = 3
    for i in range(2):
        tables[i, :2] = [1, 2]
        tables[i, 2:] = np.arange(nxt, nxt + mb - 2)
        nxt += mb - 2
    tables = jnp.asarray(tables)

    toks = jnp.concatenate(conts, axis=0)               # [2, 5]
    lg, pools = model.prefill_paged_continued(params, toks, pools,
                                              tables, plen)
    for i in range(2):
        full = jnp.concatenate([prefix, conts[i]], axis=1)
        ref = model.apply(params, full)
        np.testing.assert_allclose(np.asarray(lg[i]),
                                   np.asarray(ref[0, plen:]),
                                   rtol=2e-4, atol=2e-4)
    # decode a few greedy steps, compare with contiguous path
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    pos = jnp.full((2,), plen + 5, jnp.int32)
    oracle_caches = model.init_cache(2)
    full_b = jnp.concatenate([jnp.tile(prefix, (2, 1)), toks], axis=1)
    olg, oracle_caches = model.prefill(params, full_b, oracle_caches)
    otok = jnp.argmax(olg[:, -1], -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(otok))
    for _ in range(steps):
        lg2, pools = model.decode_step_paged(params, tok, pos, pools,
                                             tables)
        og2, oracle_caches = model.decode_step(params, otok, pos,
                                               oracle_caches)
        tok = jnp.argmax(lg2, -1).astype(jnp.int32)
        otok = jnp.argmax(og2, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(otok))
        pos = pos + 1
    # the shared prefix blocks were never written
    np.testing.assert_array_equal(np.asarray(pools[0]["k"][1:3]),
                                  shared_before)


def test_paged_ragged_rows_match_per_row_decode():
    """Rows at DIFFERENT positions (mixed prompt lengths, the serving
    case): paged batch decode must equal each row decoded alone."""
    model, params = _model()
    bs = 8
    lens = [5, 13]
    prompts = [jax.random.randint(jax.random.PRNGKey(3 + i), (1, l),
                                  0, 61) for i, l in enumerate(lens)]
    steps = 6
    mb = -(-(max(lens) + steps) // bs)
    n_blocks = 2 * mb + 3
    tables = _fragmented_tables(jax.random.PRNGKey(8), 2, mb, n_blocks)

    # single-row contiguous oracles
    oracle = []
    for i, pr in enumerate(prompts):
        c = model.init_cache(1)
        lg, c = model.prefill(params, pr, c)
        tok = jnp.argmax(lg[:, lens[i] - 1], -1).astype(jnp.int32)
        outs = [int(tok[0])]
        pos = jnp.asarray([lens[i]], jnp.int32)
        for _ in range(steps):
            lg, c = model.decode_step(params, tok, pos, c)
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
            outs.append(int(tok[0]))
            pos = pos + 1
        oracle.append(outs)

    # paged batch: admit each row alone (1-row prefill into its table),
    # then decode BOTH rows in one ragged batch
    pools = model.init_paged_cache(n_blocks, block_size=bs)
    toks = []
    for i, pr in enumerate(prompts):
        lg, pools = model.prefill_paged(params, pr, pools,
                                        tables[i:i + 1])
        toks.append(jnp.argmax(lg[:, lens[i] - 1], -1)[0])
    tok = jnp.stack(toks).astype(jnp.int32)
    pos = jnp.asarray(lens, jnp.int32)
    outs = [np.asarray(tok)]
    for _ in range(steps):
        lg, pools = model.decode_step_paged(params, tok, pos, pools,
                                            tables)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
        outs.append(np.asarray(tok))
        pos = pos + 1
    got = np.stack(outs, 1)                     # [2, steps+1]
    np.testing.assert_array_equal(got, np.asarray(oracle))
