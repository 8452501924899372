"""Transformer family: flash-attention kernel parity, modules, TinyGPT.

Beyond-reference scope (SURVEY.md §5.7 — the reference has none of this);
the test bar follows the repo convention: kernels against the XLA oracle,
modules against hand math, the model end-to-end until the task is learned.
Runs on the 8-virtual-device CPU mesh; Pallas kernels go through the
interpreter (same code path compiled on real TPUs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taper_tpu import models, nn, ops, optim
from taper_tpu.data.seq import (masked_token_loss, sort_task_batch,
                                sort_task_vocab)
import importlib

from taper_tpu.ops import xla as X

# the package re-exports the `attention` FUNCTION under the same name as
# the module, so fetch the module object explicitly
A = importlib.import_module("taper_tpu.ops.pallas.attention")


def _qkv(key, b, h, s, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, s, d), dtype) for k in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_oracle(causal):
    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 2, 256, 32)
    ref = X.attention(q, k, v, causal=causal)
    got = A.flash_attention(q, k, v, causal)
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_multiblock_online_softmax(causal, monkeypatch):
    # Force 4x4 blocks so the running max/sum and causal block-skip paths
    # are actually exercised (default caps would fit S=512 in one block).
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 128))
    q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 512, 16)
    ref = X.attention(q, k, v, causal=causal)
    got = A.flash_attention(q, k, v, causal)
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("d", [64, 128])
def test_flash_boundmax_bf16_matches_oracle(d):
    """bf16 causal hits the bound-max fast path (ones-padded-V ``l`` at
    D=64, explicit VPU row-sum at D=128); both must match the oracle to
    bf16 noise, fwd AND bwd (the bwd consumes the bound-shifted lse)."""
    q, k, v = _qkv(jax.random.PRNGKey(11), 1, 2, 256, d, jnp.bfloat16)
    ref = X.attention(q, k, v, causal=True)
    got = A.flash_attention(q, k, v, True)
    np.testing.assert_allclose(got.astype(jnp.float32),
                               ref.astype(jnp.float32), atol=3e-2)
    f = lambda att: lambda q: jnp.sum(
        att(q, k, v).astype(jnp.float32) ** 2)
    gr = jax.grad(f(lambda q, k, v: X.attention(q, k, v, causal=True)))(q)
    gf = jax.grad(f(lambda q, k, v: A.flash_attention(q, k, v, True)))(q)
    np.testing.assert_allclose(gf.astype(jnp.float32),
                               gr.astype(jnp.float32), atol=0.35,
                               rtol=0.05)


def test_flash_boundmax_guard_falls_back_exact():
    """Inputs past the numerical envelope (max‖q̂‖·max‖k‖ > 60) must
    flip the in-kernel predicate to the exact running-max arm — output
    still correct on wildly-scaled inputs."""
    q, k, v = _qkv(jax.random.PRNGKey(12), 1, 1, 256, 64, jnp.bfloat16)
    # ×3 puts max‖q̂‖·max‖k‖ ≈ 9× the typical ~13, past the 60 guard,
    # WITHOUT saturating the softmax (saturated rows are argmax-
    # unstable under reordered bf16 dots — any kernel would flip them)
    q = q * 3.0
    k = k * 3.0
    ref = X.attention(q, k, v, causal=True)
    got = A.flash_attention(q, k, v, True)
    # 9×-sharper softmax amplifies bf16 score noise on near-tie rows;
    # the wider atol prices that, not the kernel
    np.testing.assert_allclose(got.astype(jnp.float32),
                               ref.astype(jnp.float32), atol=6e-2)


def test_flash_grads_match_oracle():
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 256, 16)

    def loss(att):
        def f(q, k, v):
            return jnp.sum(jnp.sin(att(q, k, v)))
        return f

    gr = jax.grad(loss(lambda q, k, v: X.attention(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss(lambda q, k, v: A.flash_attention(q, k, v, True)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


def test_flash_bwd_multiblock(monkeypatch):
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 128))
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 1, 384, 16)

    def f(att):
        return lambda q, k, v: jnp.sum(att(q, k, v) ** 2)

    gr = jax.grad(f(lambda q, k, v: X.attention(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(f(lambda q, k, v: A.flash_attention(q, k, v, True)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


@pytest.mark.parametrize("grid,chunk", [("tri", "0"), ("tri", "1"),
                                        ("full", "0")])
def test_flash_causal_grid_variants_match_oracle(grid, chunk, monkeypatch):
    # triangular vs clipped-fetch full-sweep causal grids, and the
    # chunk-skipped diagonal experiment, all against the oracle — with
    # bk = 2*bq so the tri unranking sees r > 1 (partial tiles exist)
    monkeypatch.setenv("TAPER_ATTN_GRID", grid)
    monkeypatch.setenv("TAPER_ATTN_CHUNK", chunk)
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 256))
    monkeypatch.setattr(A, "_blocks_bwd",
                        lambda sq, sk, window=None, **kw: (128, 256))
    q, k, v = _qkv(jax.random.PRNGKey(7), 1, 2, 512, 16)

    def f(att):
        return lambda q, k, v: jnp.sum(att(q, k, v) ** 2)

    ref = X.attention(q, k, v, causal=True)
    got = A.flash_attention(q, k, v, True)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    gr = jax.grad(f(lambda q, k, v: X.attention(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(f(lambda q, k, v: A.flash_attention(q, k, v, True)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


def test_attention_dispatch_falls_back_for_unaligned_seq():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 100, 16)
    with ops.use_backend("pallas"):
        got = ops.attention(q, k, v, causal=True)
    ref = X.attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _gqa_qkv(key, b, hq, hkv, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, hq, s, d), dtype),
            jax.random.normal(kk, (b, hkv, s, d), dtype),
            jax.random.normal(kv, (b, hkv, s, d), dtype))


@pytest.mark.parametrize("causal,hkv", [(False, 2), (True, 2), (True, 1)])
def test_flash_gqa_native_matches_oracle(causal, hkv):
    # GQA/MQA: compact K/V heads read natively by the kernels' index
    # maps (never materialized at q-head width); oracle broadcasts.
    q, k, v = _gqa_qkv(jax.random.PRNGKey(11), 2, 4, hkv, 256, 32)
    ref = X.attention(q, k, v, causal=causal)
    got = A.flash_attention(q, k, v, causal)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_gqa_grads_match_repeat_path(monkeypatch):
    # grads vs the explicit-repeat formulation through the SAME kernel:
    # dK/dV must equal the repeat-VJP's group sum.  Multi-block so the
    # g//kvg index maps are exercised across KV revisits.
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 128))
    monkeypatch.setattr(A, "_blocks_bwd",
                        lambda sq, sk, window=None, **kw: (128, 128))
    b, hq, hkv, s, d = 1, 4, 2, 384, 16
    q, k, v = _gqa_qkv(jax.random.PRNGKey(12), b, hq, hkv, s, d)
    kr = jnp.repeat(k, hq // hkv, axis=1)
    vr = jnp.repeat(v, hq // hkv, axis=1)

    def f(att):
        return lambda q, k, v: jnp.sum(jnp.sin(att(q, k, v)))

    g1 = jax.grad(f(lambda q, k, v: A.flash_attention(q, k, v, True)),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f(lambda q, k, v: A.flash_attention(q, k, v, True)),
                  argnums=(0, 1, 2))(q, kr, vr)
    assert g1[1].shape == (b, hkv, s, d)
    np.testing.assert_allclose(g1[0], g2[0], atol=1e-6)
    np.testing.assert_allclose(
        g1[1], g2[1].reshape(b, hkv, hq // hkv, s, d).sum(2), atol=1e-5)
    np.testing.assert_allclose(
        g1[2], g2[2].reshape(b, hkv, hq // hkv, s, d).sum(2), atol=1e-5)
    # and against the oracle
    gr = jax.grad(f(lambda q, k, v: X.attention(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(gr, g1):
        np.testing.assert_allclose(bb, a, atol=5e-5)


@pytest.mark.parametrize("mode", ["window", "segments"])
def test_flash_gqa_masked_variants(mode):
    q, k, v = _gqa_qkv(jax.random.PRNGKey(13), 2, 4, 2, 256, 32)
    kw = (dict(window=100) if mode == "window"
          else dict(segment_ids=jnp.concatenate(
              [jnp.zeros((2, 128), jnp.int32),
               jnp.ones((2, 128), jnp.int32)], axis=1)))
    ref = X.attention(q, k, v, causal=True, **kw)
    got = A.flash_attention(q, k, v, True, **kw)
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("hkv,fused", [(4, True), (4, False), (2, True),
                                       (2, False), (1, True)])
def test_flash_bshd_matches_transposed(hkv, fused, monkeypatch):
    """Transpose-free [B,S,H·D] layout: same kernel bodies, index maps
    slice heads out of the lane dim — must be BIT-IDENTICAL to the
    [B,H,S,D] path on the same values (fwd and all three grads), for
    both the fused and the split backward, dense and GQA/MQA."""
    monkeypatch.setenv("TAPER_ATTN_FUSED_BWD", "1" if fused else "0")
    b, h, s, d = 2, 4, 256, 128
    q, k, v = _gqa_qkv(jax.random.PRNGKey(20), b, h, hkv, s, d,
                       jnp.bfloat16)
    qb = q.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    kb = k.transpose(0, 2, 1, 3).reshape(b, s, hkv * d)
    vb = v.transpose(0, 2, 1, 3).reshape(b, s, hkv * d)
    o4 = A.flash_attention(q, k, v, True)
    ob = A.flash_attention_bshd(qb, kb, vb, h, causal=True)
    np.testing.assert_array_equal(
        np.asarray(o4), np.asarray(
            ob.reshape(b, s, h, d).transpose(0, 2, 1, 3)))

    def f4(q, k, v):
        return jnp.sum(A.flash_attention(q, k, v, True)
                       .astype(jnp.float32) ** 2)

    def fb(q, k, v):
        return jnp.sum(A.flash_attention_bshd(q, k, v, h, causal=True)
                       .astype(jnp.float32) ** 2)

    g4 = jax.grad(f4, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(fb, argnums=(0, 1, 2))(qb, kb, vb)
    np.testing.assert_array_equal(
        np.asarray(g4[0]), np.asarray(
            gb[0].reshape(b, s, h, d).transpose(0, 2, 1, 3)))
    for i in (1, 2):
        np.testing.assert_array_equal(
            np.asarray(g4[i]), np.asarray(
                gb[i].reshape(b, s, hkv, d).transpose(0, 2, 1, 3)))


def test_rope_bshd_matches_transposed():
    from taper_tpu.nn.transformer import (apply_rope, apply_rope_bshd,
                                          rope_angles)
    b, h, s, d = 2, 4, 64, 16
    cos, sin = rope_angles(d, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    xb = x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    for off in (0, 32, jnp.tile(jnp.arange(s)[None], (b, 1)) % 17):
        r4 = apply_rope(x, cos, sin, offset=off)
        rb = apply_rope_bshd(xb, cos, sin, h, offset=off)
        np.testing.assert_allclose(
            np.asarray(rb.reshape(b, s, h, d).transpose(0, 2, 1, 3)),
            np.asarray(r4), atol=1e-6)


def test_mha_bshd_path_matches_segment_controlled(monkeypatch):
    """The module's transpose-free path (head_dim % 128 == 0) against
    the transposed path, forced via all-zero segment_ids (same
    semantics), on both backends, output and grads."""
    monkeypatch.setenv("TAPER_FLASH_MIN", "128")
    seg0 = jnp.zeros((2, 256), jnp.int32)
    for backend in ("xla", "pallas"):
        with ops.use_backend(backend):
            mha = nn.MultiHeadAttention(dim=512, num_heads=4,
                                        num_kv_heads=2, causal=True,
                                        max_seq=256, rope=True)
            p = mha.init(jax.random.PRNGKey(0))
            x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 512))
            o_new = mha.apply(p, x)
            o_old = mha.apply(p, x, segment_ids=seg0)
            np.testing.assert_allclose(np.asarray(o_new),
                                       np.asarray(o_old), atol=2e-5)
            g_new = jax.grad(lambda p: jnp.sum(mha.apply(p, x) ** 2))(p)
            g_old = jax.grad(lambda p: jnp.sum(
                mha.apply(p, x, segment_ids=seg0) ** 2))(p)
            for a, bb in zip(jax.tree_util.tree_leaves(g_new),
                             jax.tree_util.tree_leaves(g_old)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                           rtol=1e-4, atol=1e-4)


def test_mha_gqa_module_end_to_end():
    # the module layer passes compact K/V straight through (no repeat)
    mha = nn.MultiHeadAttention(dim=32, num_heads=4, num_kv_heads=2,
                                causal=True, max_seq=128, rope=True)
    p = mha.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 32))
    y = mha.apply(p, x)
    assert y.shape == (2, 128, 32)
    g = jax.grad(lambda p: jnp.sum(mha.apply(p, x) ** 2))(p)
    assert g["wk"].shape == p["wk"].shape
    assert float(jnp.abs(g["wk"]).max()) > 0


def test_layernorm_statistics_and_affine():
    ln = nn.LayerNorm(64)
    p = ln.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 64)) * 3 + 1
    y = ln.apply(p, x)
    np.testing.assert_allclose(np.mean(np.asarray(y), -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(y), -1), 1.0, atol=1e-3)
    p2 = {"g": 2 * jnp.ones(64), "b": jnp.ones(64)}
    y2 = ln.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y) + 1,
                               atol=1e-5)


def test_mha_shapes_and_grads():
    mha = nn.MultiHeadAttention(32, num_heads=4, causal=True)
    p = mha.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    y = mha.apply(p, x)
    assert y.shape == (2, 16, 32)
    g = jax.grad(lambda p: jnp.sum(mha.apply(p, x) ** 2))(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_tinygpt_is_causal():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 12)
    base = model.apply(p, toks)
    # perturbing token t must not change logits at positions < t
    t = 9
    toks2 = toks.at[0, t].set((toks[0, t] + 1) % 12)
    pert = model.apply(p, toks2)
    np.testing.assert_allclose(np.asarray(pert[0, :t]),
                               np.asarray(base[0, :t]), atol=1e-5)
    assert float(jnp.max(jnp.abs(pert[0, t:] - base[0, t:]))) > 1e-4


def test_sort_task_batch_layout():
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(0), 4, 7)
    assert toks.shape == (4, 16) and tgts.shape == (4, 16)
    assert int(jnp.sum(mask)) == 7
    np.testing.assert_array_equal(np.asarray(tgts[:, :-1]),
                                  np.asarray(toks[:, 1:]))
    # sorted segment really is sorted and a permutation of the digits
    t = np.asarray(toks)
    assert (t[:, 0] == 11).all() and (t[:, 8] == 10).all()
    for r in t:
        np.testing.assert_array_equal(np.sort(r[1:8]), r[9:16])
    # descending=True reverses exactly the sorted segment
    toks_d, _, mask_d = sort_task_batch(jax.random.PRNGKey(0), 4, 7,
                                        descending=True)
    d = np.asarray(toks_d)
    np.testing.assert_array_equal(d[:, :9], t[:, :9])   # prompt identical
    np.testing.assert_array_equal(d[:, 9:16], t[:, 15:8:-1])
    np.testing.assert_array_equal(np.asarray(mask_d), np.asarray(mask))


def test_tinygpt_learns_sort_task():
    model = models.TinyGPT(vocab_size=sort_task_vocab(), dim=48, depth=1,
                           num_heads=2, max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    opt_state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 32, 7)
        return masked_token_loss(model.apply(params, toks), tgts, mask)

    @jax.jit
    def steps(params, opt_state, key, n=50):
        def body(c, k):
            params, opt_state = c
            (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(params, k)
            params, opt_state = opt.update(g, opt_state, params)
            return (params, opt_state), a
        return jax.lax.scan(body, (params, opt_state),
                            jax.random.split(key, 50))

    accs = []
    key = jax.random.PRNGKey(1)
    for _ in range(8):
        key, k = jax.random.split(key)
        (params, opt_state), a = steps(params, opt_state, k)
        accs.append(float(a[-1]))
        if accs[-1] > 0.9:
            break
    assert max(accs) > 0.9, accs


def test_kv_cache_decode_matches_full_forward():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, 16), 0, 12)
    full = model.apply(p, toks)                      # [B, S, V]

    caches = model.init_cache(3)
    outs = []
    for t in range(16):
        logits, caches = model.decode_step(p, toks[:, t], t, caches)
        outs.append(logits)
    dec = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=2e-5)


def test_generate_greedy_continues_prompt():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    out = jax.jit(lambda p, pr: model.generate(p, pr, 8))(p, prompt)
    assert out.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(out[:, :6]),
                                  np.asarray(prompt))
    # greedy first generated token == argmax of the full forward at the
    # last prompt position
    full = model.apply(p, prompt)
    np.testing.assert_array_equal(np.asarray(out[:, 6]),
                                  np.asarray(jnp.argmax(full[:, -1], -1)))


def test_one_shot_prefill_matches_sequential_generate():
    """prefill() fills all P cache entries in one dispatch; greedy
    generation must equal the token-at-a-time reference path exactly,
    and the prefill logits must equal the plain full forward."""
    for kwargs in ({}, {"rope": True, "num_kv_heads": 1},
                   {"window": 5}):
        model = models.TinyGPT(vocab_size=12, dim=32, depth=2,
                               num_heads=2, max_seq=32, **kwargs)
        p = model.init(jax.random.PRNGKey(0))
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 12)

        logits, caches = model.prefill(p, prompt, model.init_cache(2))
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(model.apply(p, prompt)),
                                   atol=2e-5)
        # caches hold the same K/V the sequential path would have written
        seq_caches = model.init_cache(2)
        for t in range(7):
            _, seq_caches = model.decode_step(p, prompt[:, t], t,
                                              seq_caches)
        for c1, c2 in zip(caches, seq_caches):
            np.testing.assert_allclose(np.asarray(c1["k"][:, :, :7]),
                                       np.asarray(c2["k"][:, :, :7]),
                                       atol=2e-5)

        fast = model.generate(p, prompt, 8)
        slow = model.generate(p, prompt, 8, one_shot_prefill=False)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_generate_max_new_zero_returns_prompt():
    """max_new=0 must return the prompt untouched on BOTH paths — the
    one-shot-prefill write at position P would otherwise clamp to P-1
    and overwrite the last prompt token."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    for one_shot in (True, False):
        out = model.generate(p, prompt, 0, one_shot_prefill=one_shot)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(prompt))


def test_quantized_kv_cache_prefill_matches_sequential_fill():
    """int8 cache: prefill-filled and sequentially-filled caches must
    agree after dequantization to within one quantization step (the
    projections themselves differ in the last ulp between the one-GEMM
    prefill and the per-step matvecs, which can flip an int8 rounding —
    so bit-exact int rows are NOT guaranteed, but values are)."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16, rope=True, num_kv_heads=1)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 12)
    _, pre = model.prefill(p, prompt, model.init_cache(2, quantized=True))
    seq = model.init_cache(2, quantized=True)
    for t in range(7):
        _, seq = model.decode_step(p, prompt[:, t], t, seq)
    for c1, c2 in zip(pre, seq):
        for rows, scales in (("k", "k_scale"), ("v", "v_scale")):
            d1 = (np.asarray(c1[rows][:, :, :7], np.float32)
                  * np.asarray(c1[scales][:, :, :7])[..., None])
            d2 = (np.asarray(c2[rows][:, :, :7], np.float32)
                  * np.asarray(c2[scales][:, :, :7])[..., None])
            step = np.asarray(c1[scales][:, :, :7]).max()
            np.testing.assert_allclose(d1, d2, atol=1.5 * step,
                                       err_msg=rows)


def test_quantized_kv_cache_decode_close_to_exact():
    """Decode logits through an int8 cache stay close to the f32-cache
    logits (per-row symmetric int8 keeps ~0.4% rms error on K/V)."""
    model = models.TinyGPT(vocab_size=32, dim=64, depth=2, num_heads=4,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 32)
    _, exact = model.prefill(p, prompt, model.init_cache(2))
    _, quant = model.prefill(p, prompt,
                             model.init_cache(2, quantized=True))
    tok = prompt[:, -1]
    lg_e, _ = model.decode_step(p, tok, 7, exact)
    lg_q, _ = model.decode_step(p, tok, 7, quant)
    err = np.abs(np.asarray(lg_q) - np.asarray(lg_e)).max()
    spread = np.asarray(lg_e).max() - np.asarray(lg_e).min()
    assert err < 0.05 * max(spread, 1.0), (err, spread)
    # end-to-end greedy generation runs and preserves the prompt
    out = model.generate(p, prompt, 5, quantized_cache=True)
    np.testing.assert_array_equal(np.asarray(out[:, :7]),
                                  np.asarray(prompt))
    # ragged path accepts the quantized cache too
    out_r = model.generate(p, prompt, 3, quantized_cache=True,
                           prompt_lens=jnp.array([4, 7]))
    np.testing.assert_array_equal(np.asarray(out_r[:, :4]),
                                  np.asarray(prompt[:, :4]))


def test_decode_chunk_matches_full_forward():
    """Multi-token cache-backed decode (the speculative-decoding
    verifier) must produce the SAME logits as the plain full forward at
    every chunk position, across plain/RoPE+GQA/windowed configs, and
    leave the cache exactly as sequential decoding would."""
    for kwargs in ({}, {"rope": True, "num_kv_heads": 1},
                   {"window": 5}):
        model = models.TinyGPT(vocab_size=12, dim=32, depth=2,
                               num_heads=2, max_seq=32, **kwargs)
        p = model.init(jax.random.PRNGKey(0))
        toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 12)
        full = model.apply(p, toks)

        _, caches = model.prefill(p, toks[:, :4], model.init_cache(2))
        chunk_logits, caches = model.decode_chunk(p, toks[:, 4:], 4,
                                                  caches)
        np.testing.assert_allclose(np.asarray(chunk_logits),
                                   np.asarray(full[:, 4:]), atol=2e-5)
        seq = model.init_cache(2)
        for t in range(12):
            _, seq = model.decode_step(p, toks[:, t], t, seq)
        for c1, c2 in zip(caches, seq):
            np.testing.assert_allclose(np.asarray(c1["k"][:, :, :12]),
                                       np.asarray(c2["k"][:, :, :12]),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(c1["v"][:, :, :12]),
                                       np.asarray(c2["v"][:, :, :12]),
                                       atol=2e-5)


def test_decode_chunk_quantized_cache():
    """decode_chunk through an int8 cache: logits stay close to the
    exact-cache chunk logits."""
    model = models.TinyGPT(vocab_size=32, dim=64, depth=2, num_heads=4,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 32)
    _, exact = model.prefill(p, toks[:, :4], model.init_cache(2))
    _, quant = model.prefill(p, toks[:, :4],
                             model.init_cache(2, quantized=True))
    lg_e, _ = model.decode_chunk(p, toks[:, 4:], 4, exact)
    lg_q, _ = model.decode_chunk(p, toks[:, 4:], 4, quant)
    err = np.abs(np.asarray(lg_q) - np.asarray(lg_e)).max()
    spread = np.asarray(lg_e).max() - np.asarray(lg_e).min()
    assert err < 0.05 * max(spread, 1.0), (err, spread)


def test_speculative_generate_exactly_matches_greedy():
    """Speculative decoding with an INDEPENDENT draft model must emit
    exactly the target model's own greedy tokens at every gamma — the
    draft can only change the dispatch count, never the output."""
    target = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                            max_seq=64)
    draft = models.TinyGPT(vocab_size=12, dim=16, depth=1, num_heads=2,
                           max_seq=64)
    pt = target.init(jax.random.PRNGKey(0))
    pd = draft.init(jax.random.PRNGKey(7))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    ref = target.generate(pt, prompt, 12)
    for gamma in (1, 3, 4):
        out = target.speculative_generate(pt, draft, pd, prompt, 12,
                                          gamma=gamma)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_self_draft_accepts_every_round():
    """With the target as its own draft every proposal is accepted:
    each verify round finalizes gamma+1 tokens, so rounds ==
    ceil((max_new-1)/(gamma+1)) — the mechanism's upper bound."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=64)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    ref = model.generate(p, prompt, 12)
    out, stats = model.speculative_generate(p, model, p, prompt, 12,
                                            gamma=3, return_stats=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert int(stats["rounds"]) == 3           # ceil(11 / 4)
    assert float(stats["tokens_per_round"]) == 4.0


def _np_mask_after_eos(row, start, eos, pad):
    row = np.array(row)
    hit = np.where(row[start:] == eos)[0]
    if hit.size:
        row[start + hit[0] + 1:] = pad
    return row


def test_generate_eos_early_stop_and_padding():
    """eos_token: generation before (and including) each row's first
    eos is unchanged vs the no-eos run; everything after is pad; the
    loop's early exit can't alter emitted tokens."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (3, 6), 0, 12)
    ref = np.asarray(model.generate(p, prompt, 12))
    eos = int(ref[0, 8])                   # row 0 emits it early
    out = np.asarray(model.generate(p, prompt, 12, eos_token=eos,
                                    pad_token=0))
    for r in range(3):
        np.testing.assert_array_equal(
            out[r], _np_mask_after_eos(ref[r], 6, eos, 0))
    # sequential oracle path agrees
    out_seq = np.asarray(model.generate(p, prompt, 12, eos_token=eos,
                                        pad_token=0,
                                        one_shot_prefill=False))
    np.testing.assert_array_equal(out, out_seq)


def test_generate_eos_ragged():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    lens = jnp.array([4, 6])
    ref = np.asarray(model.generate(p, prompt, 10, prompt_lens=lens))
    eos = int(ref[0, 5])                   # row 0's 2nd generated token
    out = np.asarray(model.generate(p, prompt, 10, prompt_lens=lens,
                                    eos_token=eos, pad_token=0))
    for r, start in enumerate([4, 6]):
        np.testing.assert_array_equal(
            out[r], _np_mask_after_eos(ref[r], start, eos, 0))


def test_speculative_generate_eos():
    target = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                            max_seq=64)
    draft = models.TinyGPT(vocab_size=12, dim=16, depth=1, num_heads=2,
                           max_seq=64)
    pt = target.init(jax.random.PRNGKey(0))
    pd = draft.init(jax.random.PRNGKey(7))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    ref = np.asarray(target.generate(pt, prompt, 12))
    eos = int(ref[0, 8])
    out = np.asarray(target.speculative_generate(
        pt, draft, pd, prompt, 12, gamma=3, eos_token=eos, pad_token=0))
    for r in range(2):
        np.testing.assert_array_equal(
            out[r], _np_mask_after_eos(ref[r], 6, eos, 0))


def test_beam_search_beam1_equals_greedy():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 12)
    np.testing.assert_array_equal(
        np.asarray(model.beam_search(p, prompt, 8, beams=1)),
        np.asarray(model.generate(p, prompt, 8)))


def test_beam_search_exhaustive_oracle():
    """W = V with max_new = 2 keeps every first token alive, so beam
    search must find the EXACT argmax 2-token continuation (verified by
    brute force over all V^2 sequences)."""
    v = 5
    model = models.TinyGPT(vocab_size=v, dim=16, depth=1, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jnp.array([[2, 0, 3]])

    lp0 = jax.nn.log_softmax(model.apply(p, prompt)[0, -1])
    best_score, best_seq = -np.inf, None
    for a in range(v):
        ext = jnp.concatenate([prompt, jnp.array([[a]])], axis=1)
        lp1 = jax.nn.log_softmax(model.apply(p, ext)[0, -1])
        for bb in range(v):
            sc = float(lp0[a]) + float(lp1[bb])
            if sc > best_score:
                best_score, best_seq = sc, [a, bb]

    out, scores = model.beam_search(p, prompt, 2, beams=v,
                                    return_all=True)
    assert list(np.asarray(out[0, 0, 3:])) == best_seq
    # scores come back sorted and the top one matches brute force
    # (length_penalty=1, len=2 → normalized = total/2)
    assert np.all(np.diff(np.asarray(scores[0])) <= 1e-6)
    np.testing.assert_allclose(float(scores[0, 0]), best_score / 2,
                               rtol=1e-5)


def test_beam_search_beats_or_matches_greedy_likelihood():
    model = models.TinyGPT(vocab_size=16, dim=32, depth=2, num_heads=2,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 16)

    def seq_logp(tokens):
        lg = jax.nn.log_softmax(
            model.apply(p, tokens)[:, :-1].astype(jnp.float32), -1)
        pick = jnp.take_along_axis(lg, tokens[:, 1:, None], -1)[..., 0]
        return np.asarray(jnp.sum(pick[:, 4:], axis=1))   # generated part

    greedy = model.generate(p, prompt, 8)
    beam = model.beam_search(p, prompt, 8, beams=4)
    assert np.all(seq_logp(beam) >= seq_logp(greedy) - 1e-4)


def test_beam_search_eos_freezes_beams():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=32)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 12)
    ref = np.asarray(model.beam_search(p, prompt, 10, beams=3))
    eos = int(ref[0, 7])
    out, scores = model.beam_search(p, prompt, 10, beams=3,
                                    eos_token=eos, pad_token=0,
                                    return_all=True)
    out = np.asarray(out)
    # after any row's first eos (generated region) everything is pad
    for bi in range(2):
        for w in range(3):
            row = out[bi, w]
            hit = np.where(row[5:] == eos)[0]
            if hit.size:
                assert np.all(row[5 + hit[0] + 1:] == 0), row
    assert out.shape == (2, 3, 15) and scores.shape == (2, 3)


def test_speculative_lockstep_matches_greedy():
    """per_row=False (the lockstep-min scheme) must also emit exactly
    the target's greedy tokens — regression for the legacy path now
    that per-row is the default."""
    target = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                            max_seq=64)
    draft = models.TinyGPT(vocab_size=12, dim=16, depth=1, num_heads=2,
                           max_seq=64)
    pt = target.init(jax.random.PRNGKey(0))
    pd = draft.init(jax.random.PRNGKey(7))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    ref = target.generate(pt, prompt, 12)
    out = target.speculative_generate(pt, draft, pd, prompt, 12,
                                      gamma=3, per_row=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_per_row_no_slower_than_lockstep():
    """Per-row acceptance commits at least as many tokens per round as
    lockstep-min on the same inputs, so its dispatch count is ≤ —
    with a real (mismatched-acceptance) batch it should be strictly <."""
    target = models.TinyGPT(vocab_size=24, dim=32, depth=2, num_heads=2,
                            max_seq=128)
    draft = models.TinyGPT(vocab_size=24, dim=16, depth=1, num_heads=2,
                           max_seq=128)
    pt = target.init(jax.random.PRNGKey(0))
    pd = draft.init(jax.random.PRNGKey(7))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, 24)
    ref = target.generate(pt, prompt, 24)
    out_r, st_r = target.speculative_generate(
        pt, draft, pd, prompt, 24, gamma=3, return_stats=True)
    out_l, st_l = target.speculative_generate(
        pt, draft, pd, prompt, 24, gamma=3, per_row=False,
        return_stats=True)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(ref))
    assert int(st_r["rounds"]) <= int(st_l["rounds"]), (st_r, st_l)


def test_spec_accept_rows_rejection_sampling_lemma():
    """Per-row variant of the rejection-sampling lemma: emitted tokens
    (accepted draft or residual sample) distributed exactly as p."""
    from taper_tpu.models.transformer import _spec_accept_rows
    v = 8
    q = jax.nn.softmax(jnp.arange(v, dtype=jnp.float32) * 0.4)
    p = jax.nn.softmax(-jnp.arange(v, dtype=jnp.float32) * 0.3)
    bonus = jnp.full((v,), 1.0 / v)
    pfull = jnp.stack([p, bonus])[None]          # [1, 2, V]

    def one(key):
        kd, ka = jax.random.split(key)
        d = jax.random.categorical(kd, jnp.log(q))[None, None]
        n_acc, nxt, _ = _spec_accept_rows(ka, d, q[None, None], pfull)
        return jnp.where(n_acc[0] == 1, d[0, 0], nxt[0])

    toks = jax.jit(jax.vmap(one))(
        jax.random.split(jax.random.PRNGKey(0), 20000))
    freq = np.bincount(np.asarray(toks), minlength=v) / 20000.0
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.02)


def test_spec_accept_rejection_sampling_lemma():
    """The speculative-sampling primitive must emit tokens distributed
    EXACTLY as the target distribution p: draft x~q accepted w.p.
    min(1, p(x)/q(x)), else a residual norm(max(p−q,0)) sample.  Checked
    empirically at γ=1 over 20k keys against a deliberately mismatched
    (q, p) pair."""
    from taper_tpu.models.transformer import _spec_accept
    v = 8
    q = jax.nn.softmax(jnp.arange(v, dtype=jnp.float32) * 0.4)
    p = jax.nn.softmax(-jnp.arange(v, dtype=jnp.float32) * 0.3)
    bonus = jnp.full((v,), 1.0 / v)
    pfull = jnp.stack([p, bonus])[None]          # [1, 2, V]

    def one(key):
        kd, ka = jax.random.split(key)
        d = jax.random.categorical(kd, jnp.log(q))[None, None]
        n_acc, nxt, _ = _spec_accept(ka, d, q[None, None], pfull)
        return jnp.where(n_acc == 1, d[0, 0], nxt[0])

    toks = jax.jit(jax.vmap(one))(
        jax.random.split(jax.random.PRNGKey(0), 20000))
    freq = np.bincount(np.asarray(toks), minlength=v) / 20000.0
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.02)


def test_speculative_sampled_self_draft_accepts_every_round():
    """temperature>0 with the target as its own draft: q == p so the
    acceptance probability is 1 and every round finalizes γ+1 tokens."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=64)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    out, stats = model.speculative_generate(
        p, model, p, prompt, 12, gamma=3, temperature=1.0,
        key=jax.random.PRNGKey(3), return_stats=True)
    assert out.shape == (2, 18)
    assert int(stats["rounds"]) == 3           # ceil(11 / 4)
    np.testing.assert_array_equal(np.asarray(out[:, :6]),
                                  np.asarray(prompt))


def test_speculative_sampled_matches_target_distribution():
    """End-to-end: the joint distribution of the two tokens after the
    prompt under sampled speculative decoding (independent draft) must
    match plain target-only sampling — compared empirically over 2000
    keys on a tiny vocab."""
    v = 8
    target = models.TinyGPT(vocab_size=v, dim=16, depth=1, num_heads=2,
                            max_seq=16)
    draft = models.TinyGPT(vocab_size=v, dim=8, depth=1, num_heads=1,
                           max_seq=16)
    pt = target.init(jax.random.PRNGKey(0))
    pd = draft.init(jax.random.PRNGKey(9))
    prompt = jnp.array([[1, 5, 2]])
    n = 2000

    plain = jax.jit(jax.vmap(lambda k: target.generate(
        pt, prompt, 2, temperature=1.0, key=k)[0, 3:]))(
        jax.random.split(jax.random.PRNGKey(1), n))
    spec = jax.jit(jax.vmap(lambda k: target.speculative_generate(
        pt, draft, pd, prompt, 2, gamma=2, temperature=1.0, key=k)[0, 3:]
    ))(jax.random.split(jax.random.PRNGKey(2), n))

    def joint(x):
        return np.bincount(np.asarray(x[:, 0] * v + x[:, 1]),
                           minlength=v * v) / x.shape[0]

    np.testing.assert_allclose(joint(plain), joint(spec), atol=0.045)


def test_sample_top_k_top_p_filters():
    from taper_tpu.models.transformer import _sample

    logits = jnp.array([[2.0, 1.0, 0.5, -1.0, -3.0]])
    key = jax.random.PRNGKey(0)
    # top_k=1 and tiny top_p are argmax regardless of key
    for kwargs in ({"top_k": 1}, {"top_p": 1e-6}):
        for seed in range(5):
            nxt, _ = _sample(logits, jax.random.PRNGKey(seed),
                             temperature=1.0, **kwargs)
            assert int(nxt[0]) == 0, kwargs
    # permissive filters reproduce plain categorical exactly (same key)
    plain, _ = _sample(logits, key, temperature=1.0)
    loose, _ = _sample(logits, key, temperature=1.0, top_k=5, top_p=1.0)
    assert int(plain[0]) == int(loose[0])
    # top_k=3 never samples outside the top 3
    draws = jax.vmap(lambda k: _sample(logits, k, temperature=2.0,
                                       top_k=3)[0][0])(
        jax.random.split(jax.random.PRNGKey(1), 200))
    assert set(np.asarray(draws).tolist()) <= {0, 1, 2}
    # top_p=0.8 keeps only the nucleus {0, 1} (probs ~0.59, 0.22)
    draws = jax.vmap(lambda k: _sample(logits, k, temperature=1.0,
                                       top_p=0.8)[0][0])(
        jax.random.split(jax.random.PRNGKey(2), 200))
    assert set(np.asarray(draws).tolist()) <= {0, 1}


def test_ragged_generate_rejects_sequential_oracle_flag():
    """prompt_lens always uses one-shot prefill; asking for the
    sequential path must be a loud error, not a silent ignore."""
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 12)
    with pytest.raises(ValueError, match="one-shot prefill"):
        model.generate(p, prompt, 4, one_shot_prefill=False,
                       prompt_lens=jnp.array([3, 6]))


def test_tinygpt_ptq_int8_serving():
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig

    model = models.TinyGPT(vocab_size=12, dim=64, depth=2, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 12)
    ref = model.apply(params, toks)

    qmodel, qparams = ptq.quantize_model(model, params,
                                         QuantizationConfig.int8())
    got = jax.jit(qmodel.apply)(qparams, toks)
    assert got.shape == ref.shape
    # int8 PTQ keeps argmax predictions aligned with the float model
    agree = float(jnp.mean((jnp.argmax(got, -1) == jnp.argmax(ref, -1))
                           .astype(jnp.float32)))
    assert agree > 0.95, agree
    # ~4x smaller than f32 (embeddings + projections dominate)
    f32_bytes = model.param_bytes(params)
    q_bytes = ptq.quantized_bytes(qparams)
    assert q_bytes < 0.35 * f32_bytes, (q_bytes, f32_bytes)
    # KV-cache generation also runs on quantized params
    out = model.generate(qparams, toks[:, :6], 4)
    assert out.shape == (4, 10)


def test_rope_relative_shift_invariance():
    # RoPE scores depend only on relative positions: shifting both q and
    # k positions by the same offset leaves q·k rotations' inner products
    # unchanged.
    from taper_tpu.nn.transformer import apply_rope, rope_angles
    cos, sin = rope_angles(16, 64)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 8, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8, 16))
    s0 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, cos, sin, 0),
                    apply_rope(k, cos, sin, 0))
    s7 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, cos, sin, 7),
                    apply_rope(k, cos, sin, 7))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s7), atol=1e-4)


def test_mha_rope_decode_matches_full_forward():
    from taper_tpu.nn.transformer import (mha_apply_decode,
                                          mha_init_cache)
    mha = nn.MultiHeadAttention(32, num_heads=2, causal=True, rope=True,
                                max_seq=16)
    p = mha.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    full = mha.apply(p, x)
    cache = mha_init_cache(mha, 2, 16)
    outs = []
    for t in range(10):
        y, cache = mha_apply_decode(mha, p, x[:, t:t + 1], cache, t)
        outs.append(y[:, 0])
    dec = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               atol=2e-5)


def test_tinygpt_rope_decode_and_causality():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16, rope=True)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 12)
    full = model.apply(p, toks)
    caches = model.init_cache(2)
    outs = []
    for t in range(16):
        logits, caches = model.decode_step(p, toks[:, t], t, caches)
        outs.append(logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), atol=2e-5)


def test_mha_gqa_shapes_cache_and_decode_parity():
    from taper_tpu.nn.transformer import (mha_apply_decode,
                                          mha_init_cache)
    mha = nn.MultiHeadAttention(32, num_heads=4, num_kv_heads=2,
                                causal=True)
    p = mha.init(jax.random.PRNGKey(0))
    assert p["wk"].shape == (16, 32) and p["wv"].shape == (16, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    full = mha.apply(p, x)
    assert full.shape == (2, 10, 32)
    cache = mha_init_cache(mha, 2, 16)
    assert cache["k"].shape == (2, 2, 16, 8)   # kv heads, not q heads
    outs = []
    for t in range(10):
        y, cache = mha_apply_decode(mha, p, x[:, t:t + 1], cache, t)
        outs.append(y[:, 0])
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), atol=2e-5)
    # grads flow to the narrow kv projections
    g = jax.grad(lambda p: jnp.sum(mha.apply(p, x) ** 2))(p)
    assert float(jnp.max(jnp.abs(g["wk"]))) > 0


def test_tinygpt_gqa_rope_generate():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=4,
                           num_kv_heads=1, rope=True, max_seq=16)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 12)
    full = model.apply(p, toks)
    caches = model.init_cache(2)
    assert caches[0]["k"].shape[1] == 1        # MQA: one kv head
    outs = []
    for t in range(16):
        logits, caches = model.decode_step(p, toks[:, t], t, caches)
        outs.append(logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), atol=2e-5)
    out = model.generate(p, toks[:, :4], 6)
    assert out.shape == (2, 10)


def test_ragged_generate_matches_per_row():
    """Variable-length prompts in ONE batch (right-padded +
    prompt_lens): each row's greedy continuation must equal generating
    that row alone at its true length — pad positions can never leak
    into any row's attention."""
    for kwargs in ({}, {"rope": True, "num_kv_heads": 1, "window": 6}):
        model = models.TinyGPT(vocab_size=12, dim=32, depth=2,
                               num_heads=2, max_seq=32, **kwargs)
        p = model.init(jax.random.PRNGKey(0))
        full = jax.random.randint(jax.random.PRNGKey(1), (3, 7), 0, 12)
        lens = jnp.array([7, 4, 2], jnp.int32)
        # poison the pad region: result must be invariant to it
        pad_poison = jnp.where(
            jnp.arange(7)[None, :] < lens[:, None], full, 11)

        max_new = 5
        out = model.generate(p, pad_poison, max_new, prompt_lens=lens)
        for r in range(3):
            L = int(lens[r])
            solo = model.generate(p, full[r:r + 1, :L], max_new)
            np.testing.assert_array_equal(
                np.asarray(out[r, :L + max_new]),
                np.asarray(solo[0]),
                err_msg=f"row {r} (kwargs={kwargs})")


def test_remat_matches_plain_exactly():
    """remat=True (jax.checkpoint per block) recomputes activations in
    the backward — outputs and gradients must equal the plain model
    bit-for-bit (same program, different scheduling)."""
    plain = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16)
    remat = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16, remat=True)
    p = plain.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 12)

    np.testing.assert_array_equal(np.asarray(plain.apply(p, toks)),
                                  np.asarray(remat.apply(p, toks)))

    def loss(model, p):
        return jnp.sum(model.apply(p, toks) ** 2)

    g1 = jax.grad(lambda p: loss(plain, p))(p)
    g2 = jax.grad(lambda p: loss(remat, p))(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_sparse_moe_matches_dense_at_large_capacity():
    """Capacity-routed dispatch == the dense oracle when nothing drops
    (capacity_factor = n_experts/top_k makes cap = T): outputs AND
    gradients (VERDICT r2 item 6)."""
    from taper_tpu.nn.transformer import MoEMLP

    n, k = 8, 2
    dense = MoEMLP(32, n_experts=n, ratio=2, top_k=k)
    sparse = MoEMLP(32, n_experts=n, ratio=2, top_k=k,
                    capacity_factor=n / k)
    params = dense.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))

    y_d = dense.apply(params, x)
    y_s = sparse.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                               atol=1e-5)

    gd = jax.grad(lambda p, x: jnp.sum(dense.apply(p, x) ** 2),
                  argnums=(0, 1))(params, x)
    gs = jax.grad(lambda p, x: jnp.sum(sparse.apply(p, x) ** 2),
                  argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_sparse_moe_capacity_drops_tokens():
    """With a tight capacity, overloaded experts drop their overflow
    slots (those tokens lose that expert's contribution only); output
    stays finite and the kept tokens still match the oracle where no
    drop occurred."""
    from taper_tpu.nn.transformer import MoEMLP

    moe = MoEMLP(16, n_experts=4, ratio=2, top_k=1,
                 capacity_factor=0.5)
    params = moe.init(jax.random.PRNGKey(0))
    # all tokens identical -> all route to ONE expert; capacity keeps
    # only ceil(T/n*0.5) of T slots, rest drop to zero output
    x = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16)), (1, 8, 16))
    y = moe.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()
    # cap = ceil(1*8/4*0.5) = 1: exactly one position nonzero
    nz = np.any(np.abs(np.asarray(y[0])) > 1e-9, axis=-1)
    assert nz.sum() == 1, nz


def test_tinygpt_sparse_moe_trains():
    model = models.TinyGPT(vocab_size=sort_task_vocab(), dim=32, depth=1,
                           num_heads=2, max_seq=16, n_experts=4,
                           top_k=2, capacity_factor=1.5)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        return masked_token_loss(model.apply(params, toks), tgts, mask)

    @jax.jit
    def step(params, state, key):
        (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        params, state = opt.update(g, state, params)
        return params, state, l

    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_tinygpt_moe_trains_and_checkpoints(tmp_path):
    from taper_tpu.utils import checkpoint as ckpt

    model = models.TinyGPT(vocab_size=sort_task_vocab(), dim=32, depth=2,
                           num_heads=2, max_seq=16, n_experts=4,
                           top_k=2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        return masked_token_loss(model.apply(params, toks), tgts, mask)

    @jax.jit
    def step(params, state, key):
        (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        params, state = opt.update(g, state, params)
        return params, state, l

    gate0 = np.asarray(params["blocks"][0]["mlp"]["gate"]).copy()
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    # gate grads actually flowed: the gate moved from its init values
    assert not np.allclose(
        np.asarray(params["blocks"][0]["mlp"]["gate"]), gate0)

    # checkpoint roundtrip of the nested transformer pytree
    path = str(tmp_path / "gpt.npz")
    ckpt.save_checkpoint(path, params)
    loaded, _meta = ckpt.load_checkpoint(path, template=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 12)
    np.testing.assert_allclose(np.asarray(model.apply(loaded, toks)),
                               np.asarray(model.apply(params, toks)),
                               atol=1e-6)


@pytest.mark.parametrize("window", [64, 128, 200])
def test_sliding_window_flash_matches_oracle(window, monkeypatch):
    # small blocks force both skip edges (behind-window and above-diag)
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 128))
    q, k, v = _qkv(jax.random.PRNGKey(11), 1, 2, 512, 16)
    ref = X.attention(q, k, v, causal=True, window=window)
    got = A.flash_attention(q, k, v, True, None, window=window)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sliding_window_grads_match(monkeypatch):
    monkeypatch.setattr(A, "_blocks",
                        lambda sq, sk, window=None, **kw: (128, 128))
    q, k, v = _qkv(jax.random.PRNGKey(12), 1, 1, 384, 16)

    def f(att):
        return lambda q, k, v: jnp.sum(att(q, k, v) ** 2)

    gr = jax.grad(f(lambda q, k, v: X.attention(
        q, k, v, causal=True, window=100)), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(f(lambda q, k, v: A.flash_attention(
        q, k, v, True, None, window=100)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(b, a, atol=5e-5)


def test_sliding_window_dispatch_and_mha():
    # ops-layer passthrough + module-level window on the oracle path
    q, k, v = _qkv(jax.random.PRNGKey(13), 1, 2, 128, 16)
    with ops.use_backend("pallas"):
        got = ops.attention(q, k, v, causal=True, window=32)
    ref = X.attention(q, k, v, causal=True, window=32)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_tinygpt_window_decode_matches_full_forward():
    model = models.TinyGPT(vocab_size=12, dim=32, depth=2, num_heads=2,
                           max_seq=16, window=5, rope=True)
    p = model.init(jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 12)
    full = model.apply(p, toks)
    caches = model.init_cache(2)
    outs = []
    for t in range(16):
        logits, caches = model.decode_step(p, toks[:, t], t, caches)
        outs.append(logits)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, 1)),
                               np.asarray(full), atol=2e-5)
    # windowing is real: perturbing a token far outside the window does
    # not change late logits, perturbing inside does
    far = toks.at[0, 0].set((toks[0, 0] + 1) % 12)
    assert float(jnp.max(jnp.abs(model.apply(p, far)[0, 10:]
                                 - full[0, 10:]))) < 1e-5
    near = toks.at[0, 13].set((toks[0, 13] + 1) % 12)
    assert float(jnp.max(jnp.abs(model.apply(p, near)[0, 15]
                                 - full[0, 15]))) > 1e-4


def test_tinygpt_trains_with_fake_quant_weights():
    """QAT-style training of the transformer family: int8 fake-quantize
    (STE) every projection weight inside the loss; the f32 master
    weights keep learning through the straight-through gradients."""
    from taper_tpu.quantization.fake_quantize import fake_quantize_int

    model = models.TinyGPT(vocab_size=sort_task_vocab(), dim=32, depth=1,
                           num_heads=2, max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    state = opt.init(params)

    def fq_tree(params):
        def fq(leaf):
            if leaf.ndim == 2 and leaf.size >= 64:
                amax = jnp.max(jnp.abs(leaf)) + 1e-8
                scale = amax / 127.0
                return fake_quantize_int(leaf, scale, 0.0, -127, 127)
            return leaf
        return jax.tree.map(fq, params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        logits = model.apply(fq_tree(params), toks)
        return masked_token_loss(logits, tgts, mask)

    @jax.jit
    def step(params, state, key):
        (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        params, state = opt.update(g, state, params)
        return params, state, l

    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, key)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_vit_forward_and_patchify():
    model = models.vit_cifar(dim=32, depth=1, num_heads=2)
    p = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    logits = model.apply(p, x)
    assert logits.shape == (2, 10)
    # patchify is a pure re-layout: reconstructing pixel (c,y,x) from the
    # patch tensor matches the original
    patches = model._patchify(x)        # [B, 64, 48]
    b, c, y, xx = 1, 2, 13, 7
    g, pp = 8, 4
    pi = (y // pp) * g + (xx // pp)
    offset = c * pp * pp + (y % pp) * pp + (xx % pp)
    np.testing.assert_allclose(float(patches[b, pi, offset]),
                               float(x[b, c, y, xx]))


def test_vit_learns_synthetic_cifar():
    from taper_tpu import losses
    from taper_tpu.data.cifar10 import synthesize_cifar

    labels = np.arange(256) % 10
    images = jnp.asarray(synthesize_cifar(labels.astype(np.int32)))
    y = jnp.asarray(labels, jnp.int32)
    model = models.vit_cifar(dim=48, depth=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_of(p):
            logits = model.apply(p, images)
            return losses.cross_entropy_loss(logits, y), logits
        (l, logits), g = jax.value_and_grad(loss_of, has_aux=True)(params)
        params, state = opt.update(g, state, params)
        return params, state, l, losses.accuracy(logits, y)

    accs = []
    for _ in range(60):
        params, state, l, a = step(params, state)
        accs.append(float(a))
    assert accs[-1] > 0.5, accs[-5:]     # chance = 0.1


def test_vit_ptq_int8():
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig

    model = models.vit_cifar(dim=48, depth=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    ref = model.apply(params, x)
    qmodel, qparams = ptq.quantize_model(model, params,
                                         QuantizationConfig.int8())
    got = jax.jit(qmodel.apply)(qparams, x)
    agree = float(jnp.mean((jnp.argmax(got, -1) == jnp.argmax(ref, -1))
                           .astype(jnp.float32)))
    assert agree >= 0.875, agree
    assert ptq.quantized_bytes(qparams) < 0.35 * model.param_bytes(params)


@pytest.mark.parametrize("s,window", [(1024, 768), (512, 512),
                                      (512, 384)])
def test_sliding_window_large_window_default_blocks(s, window):
    """Regression: windows approaching S with the DEFAULT block sizes
    once hit a clamped banded grid whose band start went negative and
    produced all-zero outputs/grads."""
    q, k, v = _qkv(jax.random.PRNGKey(30), 1, 2, s, 16)
    ref = X.attention(q, k, v, causal=True, window=window)
    got = A.flash_attention(q, k, v, True, None, window=window)
    assert float(jnp.max(jnp.abs(got))) > 0
    np.testing.assert_allclose(got, ref, atol=2e-5)
    g = jax.grad(lambda a: jnp.sum(A.flash_attention(
        a, k, v, True, None, window=window) ** 2))(q)
    gr = jax.grad(lambda a: jnp.sum(X.attention(
        a, k, v, causal=True, window=window) ** 2))(q)
    np.testing.assert_allclose(g, gr, atol=5e-5)


def test_sliding_window_noncausal_matches_oracle():
    """Regression: non-causal windows once ran the causal banded grid
    and dropped all future columns."""
    q, k, v = _qkv(jax.random.PRNGKey(31), 1, 2, 1024, 16)
    ref = X.attention(q, k, v, causal=False, window=256)
    got = A.flash_attention(q, k, v, False, None, window=256)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    g = jax.grad(lambda a: jnp.sum(A.flash_attention(
        a, k, v, False, None, window=256) ** 2))(q)
    gr = jax.grad(lambda a: jnp.sum(X.attention(
        a, k, v, causal=False, window=256) ** 2))(q)
    np.testing.assert_allclose(g, gr, atol=5e-5)


def test_windowed_dispatch_requires_equal_lengths():
    # sq != sk with a window: the oracle bottom-aligns, the kernel uses
    # absolute positions — dispatch must take the oracle
    q, _, _ = _qkv(jax.random.PRNGKey(32), 1, 2, 128, 16)
    _, k, v = _qkv(jax.random.PRNGKey(33), 1, 2, 2048, 16)
    import os
    os.environ["TAPER_FLASH_MIN"] = "128"
    try:
        with ops.use_backend("pallas"):
            got = ops.attention(q, k, v, causal=False, window=512)
    finally:
        del os.environ["TAPER_FLASH_MIN"]
    ref = X.attention(q, k, v, causal=False, window=512)
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Multi-turn serving: KV-cache reuse across generate calls
# ---------------------------------------------------------------------------

def test_generate_continued_matches_one_shot():
    """Prefix caching: prefill half the prompt in turn 1, hand the
    cache to generate_continued with the rest — tokens must equal the
    single full-prompt generate."""
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    p0 = jax.random.randint(jax.random.PRNGKey(1), (3, 8), 0, 32)

    ref = model.generate(params, p0, 6)
    # turn 1: prefill cols [0, 4) (the 1 sampled token is discarded —
    # its k/v was never written, so the cache holds exactly [0, 4))
    _, caches = model.generate(params, p0[:, :4], 1, return_cache=True)
    t2 = model.generate_continued(params, p0[:, 4:], 6, caches,
                                  past_len=4)
    got = jnp.concatenate([p0[:, :4], t2], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_generate_continued_chained_turns_quantized_cache():
    """Three chained turns through one int8 KV cache == one long
    generate (same per-position quantization either way)."""
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           num_kv_heads=2, max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(2))
    p0 = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 32)

    full = model.generate(params, p0, 10, quantized_cache=True)
    t1, c = model.generate(params, p0, 4, quantized_cache=True,
                           return_cache=True)             # [B, 12]
    t2, c = model.generate_continued(params, t1[:, -1:], 3, c,
                                     past_len=t1.shape[1] - 1,
                                     return_cache=True)   # [B, 1+3]
    cur = jnp.concatenate([t1, t2[:, 1:]], axis=1)        # [B, 15]
    t3 = model.generate_continued(params, t2[:, -1:], 3, c,
                                  past_len=cur.shape[1] - 1)
    got = jnp.concatenate([cur, t3[:, 1:]], axis=1)       # [B, 18]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full))


def test_generate_continued_eos_noop_matches_plain():
    """eos path with a never-emitted token == the plain scan path."""
    model = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=2,
                           max_seq=48)
    params = model.init(jax.random.PRNGKey(4))
    p0 = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 1, 16)
    _, caches = model.generate(params, p0, 1, return_cache=True)
    nxt = jax.random.randint(jax.random.PRNGKey(6), (2, 2), 1, 16)
    a = model.generate_continued(params, nxt, 5, caches, past_len=6)
    _, caches2 = model.generate(params, p0, 1, return_cache=True)
    b = model.generate_continued(params, nxt, 5, caches2, past_len=6,
                                 eos_token=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_return_cache_contracts():
    """max_new=0 + return_cache is the prefill-only call; eos_token +
    return_cache is rejected (partial-fill hazard)."""
    model = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=2,
                           max_seq=32)
    params = model.init(jax.random.PRNGKey(0))
    p0 = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, 16)
    toks, caches = model.generate(params, p0, 0, return_cache=True)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(p0))
    # continuation from the prefill-only cache == full-prompt generate
    nxt = jax.random.randint(jax.random.PRNGKey(2), (2, 2), 0, 16)
    t2 = model.generate_continued(params, nxt, 4, caches, past_len=5)
    ref = model.generate(params, jnp.concatenate([p0, nxt], 1), 4)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([p0, t2], 1)), np.asarray(ref))
    with pytest.raises(ValueError):
        model.generate(params, p0, 4, eos_token=3, return_cache=True)


# ---------------------------------------------------------------------------
# Llama-style options: RMSNorm + SwiGLU
# ---------------------------------------------------------------------------

def test_rmsnorm_math_and_dtype():
    ln = nn.RMSNorm(8)
    p = ln.init(jax.random.PRNGKey(0))
    p = {"g": jnp.asarray(np.linspace(0.5, 2.0, 8), jnp.float32)}
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8), jnp.float32) * 4
    got = ln.apply(p, x)
    ref = (np.asarray(x) / np.sqrt(
        np.mean(np.asarray(x) ** 2, -1, keepdims=True) + 1e-5)
        * np.asarray(p["g"]))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    # bf16 in -> bf16 out, stats still f32
    xb = x.astype(jnp.bfloat16)
    assert ln.apply(p, xb).dtype == jnp.bfloat16


def test_swiglu_mlp_math():
    m = nn.MLPBlock(4, ratio=2, gated=True)
    p = m.init(jax.random.PRNGKey(0))
    assert set(p) == {"w1", "w2", "w3", "b1", "b2", "b3"}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4))
    got = m.apply(p, x)
    x2 = np.asarray(x).reshape(6, 4)
    h = x2 @ np.asarray(p["w1"]).T + np.asarray(p["b1"])
    g = x2 @ np.asarray(p["w3"]).T + np.asarray(p["b3"])
    silu = h / (1 + np.exp(-h)) * g
    ref = (silu @ np.asarray(p["w2"]).T
           + np.asarray(p["b2"])).reshape(2, 3, 4)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_tinygpt_llama_style_trains_and_decodes():
    """norm='rms' + mlp_act='swiglu' + RoPE + GQA: the Llama recipe —
    learns the sort task and the KV-cache decode path agrees with the
    full forward."""
    model = models.TinyGPT(vocab_size=sort_task_vocab(8), dim=64,
                           depth=2, num_heads=4, num_kv_heads=2,
                           max_seq=32, rope=True, norm="rms",
                           mlp_act="swiglu")
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        toks, tgts, mask = sort_task_batch(key, 64, 8, base=8)
        def loss_of(p):
            return masked_token_loss(model.apply(p, toks), tgts, mask)[0]
        loss, grads = jax.value_and_grad(loss_of)(params)
        params, state = opt.update(grads, state, params)
        return params, state, loss

    key = jax.random.PRNGKey(1)
    l0 = None
    for i in range(200):
        key, k = jax.random.split(key)
        params, state, loss = step(params, state, k)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < 0.25 * l0, (l0, float(loss))

    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 8)
    seq = model.generate(params, prompt, 8, one_shot_prefill=False)
    fast = model.generate(params, prompt, 8)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(fast))


# ---------------------------------------------------------------------------
# Ring-buffer KV cache for sliding-window models: O(W) memory + reads
# ---------------------------------------------------------------------------

def test_ring_cache_generate_matches_full_cache():
    """window=8 model, generation far past W: ring-cache tokens equal
    full-cache tokens exactly (same math, W slots instead of max_seq);
    also with GQA + quantized int8 ring cache."""
    for kv, quant in ((None, False), (2, True)):
        model = models.TinyGPT(vocab_size=32, dim=32, depth=2,
                               num_heads=4, num_kv_heads=kv,
                               max_seq=64, rope=True, window=8)
        params = model.init(jax.random.PRNGKey(0))
        prompt = jax.random.randint(jax.random.PRNGKey(1), (3, 12), 0,
                                    32)
        full = model.generate(params, prompt, 30,
                              quantized_cache=quant)
        ring = model.generate(params, prompt, 30,
                              quantized_cache=quant, ring_cache=True)
        np.testing.assert_array_equal(np.asarray(ring),
                                      np.asarray(full))
    # the memory claim: W slots, not max_seq
    c = model.init_cache(3, ring=True)
    assert c[0]["k"].shape[2] == 8
    assert c[0]["k_scale"].shape[2] == 8 if "k_scale" in c[0] else True


def test_ring_cache_short_prompt_and_guards():
    model = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=2,
                           max_seq=48, window=8)
    params = model.init(jax.random.PRNGKey(2))
    # prompt shorter than W (no wrap during prefill)
    p = jax.random.randint(jax.random.PRNGKey(3), (2, 3), 0, 16)
    full = model.generate(params, p, 20)
    ring = model.generate(params, p, 20, ring_cache=True)
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(full))
    # non-window models refuse ring caches
    nm = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=2,
                        max_seq=48)
    with pytest.raises(AssertionError):
        nm.init_cache(2, ring=True)
    # ragged + ring is rejected (pad rows would alias ring slots)
    with pytest.raises(ValueError):
        model.generate(params, p, 4, prompt_lens=jnp.array([2, 3]),
                       ring_cache=True)


def test_blocks_policy_defaults_and_env_refusal(monkeypatch):
    """Block-selection policy (r5): bf16 KV blocks cap at 1024 at both
    S=2048 and S=4096 (re-sweep after the bound-max/tri-grid changes:
    633 vs 659 us at S=4096 — the r3 'wider wins at 4096' rule
    inverted); f32 keeps (512, 2048); bq >= 2048 overrides are REFUSED
    (known Mosaic compile wedge), as are non-dividing blocks."""
    A = importlib.import_module("taper_tpu.ops.pallas.attention")

    assert A._blocks(4096, 4096, bf16_inputs=True) == (1024, 1024)
    assert A._blocks(2048, 2048, bf16_inputs=True) == (1024, 1024)
    assert A._blocks(4096, 4096, bf16_inputs=False) == (512, 2048)

    monkeypatch.setenv("TAPER_ATTN_FWD_BLOCKS", "2048,2048")
    with pytest.raises(ValueError, match="refused"):
        A._blocks(4096, 4096, bf16_inputs=True)
    monkeypatch.setenv("TAPER_ATTN_FWD_BLOCKS", "384,512")
    with pytest.raises(ValueError):
        A._blocks(4096, 4096, bf16_inputs=True)   # 384 does not divide
    monkeypatch.setenv("TAPER_ATTN_FWD_BLOCKS", "512,512")
    assert A._blocks(4096, 4096, bf16_inputs=True) == (512, 512)
