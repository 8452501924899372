"""Transformer on the 8-virtual-device mesh: sharded flash attention and
DP+TP TinyGPT training (GSPMD).

The attention kernel is manually partitioned with ``shard_map`` (GSPMD
cannot see inside a pallas_call); the rest of the model scales through
sharding annotations alone.
"""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models, nn, optim, parallel
from taper_tpu.data.seq import masked_token_loss, sort_task_batch
from taper_tpu.ops import xla as X


def test_sharded_flash_attention_matches_oracle():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 4, 2, 128, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    ref = X.attention(q, k, v, causal=True)
    got = parallel.sharded_attention(mesh, q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_tinygpt_dp_tp_training_step_matches_single_device():
    mesh = parallel.make_mesh(data=4, model=2)
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    opt_state = opt.init(params)
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    def step(params, opt_state, toks, tgts):
        def loss_of(p):
            return masked_token_loss(model.apply(p, toks), tgts, mask)[0]
        loss, grads = jax.value_and_grad(loss_of)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    # single device reference
    p1, _, l1 = jax.jit(step)(params, opt_state, toks, tgts)

    # DP batch + TP over weight output features via GSPMD
    psh = parallel.param_sharding(mesh, params, tensor_parallel=True)
    params_sh = parallel.shard_params(params, psh)
    opt_sh = opt.init(params_sh)
    toks_sh = jax.device_put(toks, parallel.batch_sharding(mesh))
    tgts_sh = jax.device_put(tgts, parallel.batch_sharding(mesh))
    p2, _, l2 = jax.jit(step)(params_sh, opt_sh, toks_sh, tgts_sh)

    assert abs(float(l1) - float(l2)) < 1e-5
    a = jax.tree_util.tree_leaves(p1)
    b = jax.tree_util.tree_leaves(p2)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5)


def test_sequence_parallel_attention_matches_oracle():
    # Q/K/V sharded over the sequence on the 'model' axis; the kernel's
    # q_offset keeps the causal mask globally correct per shard.
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 2, 2, 256, 16          # 128 rows of Q per device
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    ref = X.attention(q, k, v, causal=True)
    got = parallel.sequence_parallel_attention(mesh, q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_sequence_parallel_attention_grads_match():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)

    def loss_sp(q, k, v):
        return jnp.sum(parallel.sequence_parallel_attention(
            mesh, q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(X.attention(q, k, v, causal=True) ** 2)

    gs = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5)


def test_ring_attention_matches_oracle():
    # K/V never gathered: chunks rotate the ring; global q/k offsets keep
    # the causal mask exact and partial results merge via logsumexp.
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 2, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    for causal in (False, True):
        ref = X.attention(q, k, v, causal=causal)
        got = parallel.ring_attention(mesh, q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=f"causal={causal}")


def test_ring_attention_grads_match():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(10), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)

    def loss_ring(q, k, v):
        return jnp.sum(parallel.ring_attention(
            mesh, q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(X.attention(q, k, v, causal=True) ** 2)

    gs = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5)


def test_pipeline_apply_matches_sequential_stack():
    # 4-stage GPipe over the block stack == running the layers in order.
    from taper_tpu.nn.transformer import TransformerBlock
    mesh = parallel.make_mesh(data=2, model=4)
    depth, dim = 4, 32
    blk = TransformerBlock(dim, num_heads=2, causal=True)
    key = jax.random.PRNGKey(0)
    layer_params = [blk.init(k) for k in jax.random.split(key, depth)]
    stacked = parallel.stack_layer_params(layer_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, dim))

    ref = x
    for p in layer_params:
        ref = blk.apply(p, ref)

    x_mb = x.reshape(4, 2, 16, dim)        # 4 microbatches of 2
    got = parallel.pipeline_apply(mesh, blk.apply, stacked, x_mb,
                                  axis="model")
    np.testing.assert_allclose(np.asarray(got.reshape(8, 16, dim)),
                               np.asarray(ref), atol=2e-5)


def test_pipeline_grads_match_sequential():
    from taper_tpu.nn.transformer import TransformerBlock
    mesh = parallel.make_mesh(data=2, model=4)
    depth, dim = 4, 16
    blk = TransformerBlock(dim, num_heads=2, causal=True)
    layer_params = [blk.init(k)
                    for k in jax.random.split(jax.random.PRNGKey(0), depth)]
    stacked = parallel.stack_layer_params(layer_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, dim))
    x_mb = x.reshape(4, 1, 8, dim)

    def loss_pp(stacked):
        y = parallel.pipeline_apply(mesh, blk.apply, stacked, x_mb)
        return jnp.sum(y ** 2)

    def loss_seq(stacked):
        h = x
        for i in range(depth):
            p = jax.tree.map(lambda a, i=i: a[i], stacked)
            h = blk.apply(p, h)
        return jnp.sum(h ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_expert_parallel_moe_matches_single_device():
    mesh = parallel.make_mesh(data=2, model=4)
    moe = nn.MoEMLP(32, n_experts=8, ratio=2, top_k=2)
    p = moe.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
    ref = moe.apply(p, x)
    got = parallel.expert_parallel_moe(mesh, moe, p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)
    # gates: top-k sparsity and normalization
    g = moe.gates(p, x)
    nz = np.sum(np.asarray(g) > 1e-9, axis=-1)
    assert (nz <= 2).all()
    np.testing.assert_allclose(np.asarray(jnp.sum(g, -1)), 1.0,
                               atol=1e-5)


def test_expert_parallel_moe_grads_match():
    mesh = parallel.make_mesh(data=2, model=4)
    moe = nn.MoEMLP(16, n_experts=4, ratio=2, top_k=1)
    p = moe.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))

    g_ep = jax.grad(lambda p: jnp.sum(
        parallel.expert_parallel_moe(mesh, moe, p, x) ** 2))(p)
    g_ref = jax.grad(lambda p: jnp.sum(moe.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_expert_parallel_sparse_moe_matches_single_device():
    """EP + capacity routing: each device builds buffers only for its
    own experts; identical global routing means the same slots drop, so
    the result (and grads) equal single-device apply_sparse exactly —
    including a tight capacity where drops actually occur."""
    mesh = parallel.make_mesh(data=2, model=4)
    for cf in (4.0, 0.6):        # no-drop and with-drops regimes
        moe = nn.MoEMLP(32, n_experts=8, ratio=2, top_k=2,
                        capacity_factor=cf)
        p = moe.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
        ref = moe.apply(p, x)     # routes through apply_sparse
        got = parallel.expert_parallel_moe(mesh, moe, p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, err_msg=f"cf={cf}")

    g_ep = jax.grad(lambda p: jnp.sum(
        parallel.expert_parallel_moe(mesh, moe, p, x) ** 2))(p)
    g_ref = jax.grad(lambda p: jnp.sum(moe.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_sequence_parallel_attention_with_window():
    # SP composes with sliding windows: offsets disable banded grids but
    # the global mask stays exact.
    from taper_tpu.ops.pallas import attention  # noqa: F401
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(20), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    from taper_tpu.ops.pallas.attention import flash_attention
    from jax.sharding import PartitionSpec as P

    def local(q, k, v):
        i = jax.lax.axis_index("model")
        kg = jax.lax.all_gather(k, "model", axis=2, tiled=True)
        vg = jax.lax.all_gather(v, "model", axis=2, tiled=True)
        return flash_attention(q, kg, vg, True, None,
                               q_offset=i * q.shape[2], window=100)

    spec = P(None, None, "model", None)
    got = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                        out_specs=spec, check_vma=False)(q, k, v)
    ref = X.attention(q, k, v, causal=True, window=100)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_ulysses_attention_matches_oracle():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 2, 4, 256, 16          # H=4 divisible by model=2
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    ref = X.attention(q, k, v, causal=True)
    got = parallel.ulysses_attention(mesh, q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_ulysses_attention_grads_match():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(22), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    gs = jax.grad(lambda q, k, v: jnp.sum(parallel.ulysses_attention(
        mesh, q, k, v, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(X.attention(
        q, k, v, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5)


def test_checkpoint_roundtrip_of_sharded_params(tmp_path):
    # save_checkpoint gathers mesh-sharded leaves to host transparently;
    # reloading onto a fresh replicated tree reproduces the model.
    from taper_tpu.utils import checkpoint as ckpt

    mesh = parallel.make_mesh(data=4, model=2)
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    psh = parallel.param_sharding(mesh, params, tensor_parallel=True)
    sharded = parallel.shard_params(params, psh)

    path = str(tmp_path / "sharded.npz")
    ckpt.save_checkpoint(path, sharded)
    loaded, _ = ckpt.load_checkpoint(path, template=params)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ring_and_sp_attention_with_window():
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(40), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)
    ref = X.attention(q, k, v, causal=True, window=100)
    got_ring = parallel.ring_attention(mesh, q, k, v, causal=True,
                                       window=100)
    got_sp = parallel.sequence_parallel_attention(mesh, q, k, v,
                                                  causal=True, window=100)
    np.testing.assert_allclose(np.asarray(got_ring), np.asarray(ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_sp), np.asarray(ref),
                               atol=2e-5)


def test_ring_attention_window_grads_match():
    """Gradients through windowed ring attention: per ring chunk, rows
    behind the sliding window are FULLY masked (o=0, lse=-inf), which
    exercises the backward kernels' -inf lse guard — without it every
    dk/dv of a visited block is NaN-poisoned (advisor round-2 finding)."""
    mesh = parallel.make_mesh(data=4, model=2)
    b, h, s, d = 1, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(41), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d)) for kk in ks)

    def loss_ring(q, k, v):
        return jnp.sum(parallel.ring_attention(
            mesh, q, k, v, causal=True, window=100) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(X.attention(q, k, v, causal=True, window=100) ** 2)

    gs = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5)


def test_pipeline_parallel_tinygpt_loss_and_grads():
    """Full TinyGPT training math with the block stack pipelined: embed
    (replicated) -> 4-stage GPipe over stacked block params -> final LN
    + tied head -> masked loss. Loss and ALL gradients (embeddings,
    stacked blocks, final LN) match the single-device model exactly."""
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    mesh = parallel.make_mesh(data=2, model=4)
    depth = 4
    model = models.TinyGPT(vocab_size=12, dim=32, depth=depth,
                           num_heads=2, max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    def loss_ref(params):
        return masked_token_loss(model.apply(params, toks), tgts, mask)[0]

    # PP version: same params, blocks stacked and pipelined
    stacked = parallel.stack_layer_params(params["blocks"])
    pp_params = {**{k: v for k, v in params.items() if k != "blocks"},
                 "blocks": stacked}
    blk = model.blocks[0]

    def loss_pp(pp_params):
        b, s = toks.shape
        x = (model.tok.apply(pp_params["tok"], toks)
             + model.pos.apply(pp_params["pos"], jnp.arange(s)))
        x_mb = x.reshape(4, b // 4, s, model.dim)
        y = parallel.pipeline_apply(mesh, blk.apply,
                                    pp_params["blocks"], x_mb)
        y = y.reshape(b, s, model.dim)
        y = model.ln_f.apply(pp_params["ln_f"], y)
        logits = jnp.einsum("bse,ve->bsv", y, pp_params["tok"]["w"])
        return masked_token_loss(logits, tgts, mask)[0]

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_pp, g_pp = jax.value_and_grad(loss_pp)(pp_params)
    assert abs(float(l_ref) - float(l_pp)) < 1e-6
    # stacked block grads == stacked per-layer grads
    g_ref_stacked = parallel.stack_layer_params(g_ref["blocks"])
    for a, b_ in zip(jax.tree.leaves(g_pp["blocks"]),
                     jax.tree.leaves(g_ref_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5)
    for name in ("tok", "pos", "ln_f"):
        for a, b_ in zip(jax.tree.leaves(g_pp[name]),
                         jax.tree.leaves(g_ref[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-5)


def test_fsdp_fully_sharded_training_step_matches_replicated():
    """ZeRO-3/FSDP analogue: every param shards its largest dim over the
    data axis; XLA all-gathers per use and reduce-scatters grads. One
    Adam step reproduces the replicated trajectory exactly."""
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    mesh = parallel.make_mesh(data=8, model=1)
    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    def step(params, opt_state, toks, tgts):
        def loss_of(p):
            return masked_token_loss(model.apply(p, toks), tgts, mask)[0]
        loss, grads = jax.value_and_grad(loss_of)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, loss

    p_ref, l_ref = jax.jit(step)(params, opt.init(params), toks, tgts)

    fsh = parallel.fsdp_sharding(mesh, params)
    sharded = parallel.shard_params(params, fsh)
    # check something actually sharded
    assert any(s.spec != jax.sharding.PartitionSpec()
               for s in jax.tree.leaves(
                   fsh, is_leaf=lambda x: hasattr(x, "spec")))
    toks_sh = jax.device_put(toks, parallel.batch_sharding(mesh))
    tgts_sh = jax.device_put(tgts, parallel.batch_sharding(mesh))
    p_sh, l_sh = jax.jit(step)(sharded, opt.init(sharded), toks_sh,
                               tgts_sh)

    assert abs(float(l_ref) - float(l_sh)) < 1e-6
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# Tensor-parallel serving (parallel/serving.py)
# ---------------------------------------------------------------------------

def test_tp_sharding_specs_are_megatron_style():
    from jax.sharding import PartitionSpec as P
    from taper_tpu.parallel import serving
    mesh = parallel.make_mesh(data=2, model=4)
    model = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=4,
                           max_seq=32)
    params = model.init(jax.random.PRNGKey(0))
    sh = serving.tp_sharding(mesh, params)
    attn = sh["blocks"][0]["attn"]
    mlp = sh["blocks"][0]["mlp"]
    assert attn["wq"].spec == P("model", None)    # column-parallel
    assert attn["wo"].spec == P(None, "model")    # row-parallel
    assert attn["bq"].spec == P("model")
    assert attn["bo"].spec == P()
    assert mlp["w1"].spec == P("model", None)
    assert mlp["w2"].spec == P(None, "model")
    assert sh["tok"]["w"].spec == P("model", None)   # vocab-parallel
    assert sh["pos"]["w"].spec == P()
    assert sh["ln_f"]["g"].spec == P()
    # non-divisible dims fall back to replicated, never crash
    tiny = models.TinyGPT(vocab_size=6, dim=32, depth=1, num_heads=4,
                          max_seq=32)
    sh2 = serving.tp_sharding(mesh, tiny.init(jax.random.PRNGKey(0)))
    assert sh2["tok"]["w"].spec == P()            # 6 % 4 != 0


def test_tp_generate_matches_single_device():
    from taper_tpu.parallel import serving
    mesh = parallel.make_mesh(data=2, model=4)
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 32)

    ref = jax.jit(lambda p, q: model.generate(p, q, 12))(params, prompt)
    gen = serving.make_tp_generate(model, mesh)
    got = gen(params, prompt, 12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # compiled-path reuse: same callable again, identical output
    np.testing.assert_array_equal(np.asarray(gen(params, prompt, 12)),
                                  np.asarray(ref))


def test_tp_generate_gqa_and_eos():
    """GQA (kv heads sharded 2-way), eos early-stop while_loop under
    GSPMD, params pre-placed with tp_place."""
    from taper_tpu.parallel import serving
    mesh = parallel.make_mesh(data=4, model=2)
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           num_kv_heads=2, max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(2))
    prompt = jax.random.randint(jax.random.PRNGKey(3), (8, 4), 0, 32)

    ref = jax.jit(lambda p, q: model.generate(p, q, 10, eos_token=3))(
        params, prompt)
    placed = serving.tp_place(mesh, params)
    got = serving.tp_generate(mesh, model, placed, prompt, 10,
                              eos_token=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_megatron_tp_sharding_trains_like_single_device():
    """The serving shardings double as TRAINING shardings: one TinyGPT
    train step with tp_sharding-placed params == single device."""
    from taper_tpu.parallel import serving
    mesh = parallel.make_mesh(data=2, model=4)
    model = models.TinyGPT(vocab_size=16, dim=32, depth=1, num_heads=4,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    def step(params, opt_state, toks, tgts):
        def loss_of(p):
            return masked_token_loss(model.apply(p, toks), tgts, mask)[0]
        loss, grads = jax.value_and_grad(loss_of)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, loss

    p1, l1 = jax.jit(step)(params, opt.init(params), toks, tgts)
    placed = serving.tp_place(mesh, params)
    p2, l2 = jax.jit(step)(placed, opt.init(placed),
                           jax.device_put(toks,
                                          parallel.batch_sharding(mesh)),
                           jax.device_put(tgts,
                                          parallel.batch_sharding(mesh)))
    assert abs(float(l1) - float(l2)) < 1e-5
    for x, y in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5)


def test_tp_generate_moe_experts_sharded():
    """TP serving of an MoE TinyGPT: stacked expert weights split their
    hidden dim over 'model' (per-expert Megatron split); tokens match
    the unsharded oracle."""
    from jax.sharding import PartitionSpec as P
    from taper_tpu.parallel import serving
    mesh = parallel.make_mesh(data=2, model=4)
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=48, n_experts=4, top_k=2)
    params = model.init(jax.random.PRNGKey(0))
    sh = serving.tp_sharding(mesh, params)
    exp = sh["blocks"][0]["mlp"]["experts"]
    assert exp["w1"].spec == P(None, "model", None)
    assert exp["w2"].spec == P(None, None, "model")
    assert sh["blocks"][0]["mlp"]["gate"].spec == P()

    prompt = jax.random.randint(jax.random.PRNGKey(1), (4, 6), 0, 32)
    ref = jax.jit(lambda p, q: model.generate(p, q, 8))(params, prompt)
    got = serving.tp_generate(mesh, model, params, prompt, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_circular_pipeline_matches_sequential_stack():
    # interleaved schedule: 4 stages x 2 repeats over an 8-layer stack
    from taper_tpu.nn.transformer import TransformerBlock
    mesh = parallel.make_mesh(data=2, model=4)
    depth, dim = 8, 32
    blk = TransformerBlock(dim, num_heads=2, causal=True)
    layer_params = [blk.init(k)
                    for k in jax.random.split(jax.random.PRNGKey(0), depth)]
    stacked = parallel.stack_layer_params(layer_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, dim))

    ref = x
    for p in layer_params:
        ref = blk.apply(p, ref)

    x_mb = x.reshape(4, 2, 16, dim)        # M=4 microbatches (M >= n)
    got = parallel.pipeline_apply_circular(mesh, blk.apply, stacked,
                                           x_mb, repeats=2, axis="model")
    np.testing.assert_allclose(np.asarray(got.reshape(8, 16, dim)),
                               np.asarray(ref), atol=2e-5)

    # repeats=1 degenerates to the GPipe schedule
    got1 = parallel.pipeline_apply_circular(mesh, blk.apply, stacked,
                                            x_mb, repeats=1, axis="model")
    ref1 = parallel.pipeline_apply(mesh, blk.apply, stacked, x_mb,
                                   axis="model")
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               atol=2e-5)


def test_circular_pipeline_multilayer_spans_and_grads():
    # depth 16 = 4 stages x 2 repeats x L=2 layers per span; grads of a
    # loss through the circular schedule == sequential autodiff
    from taper_tpu.nn.transformer import TransformerBlock
    mesh = parallel.make_mesh(data=2, model=4)
    depth, dim = 16, 16
    blk = TransformerBlock(dim, num_heads=2, causal=True)
    layer_params = [blk.init(k)
                    for k in jax.random.split(jax.random.PRNGKey(0), depth)]
    stacked = parallel.stack_layer_params(layer_params)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, dim))
    x_mb = x.reshape(4, 1, 8, dim)

    def loss_pp(stacked):
        y = parallel.pipeline_apply_circular(mesh, blk.apply, stacked,
                                             x_mb, repeats=2)
        return jnp.sum(y ** 2)

    def loss_seq(stacked):
        h = x
        for i in range(depth):
            p = jax.tree.map(lambda a, i=i: a[i], stacked)
            h = blk.apply(p, h)
        return jnp.sum(h ** 2)

    np.testing.assert_allclose(float(loss_pp(stacked)),
                               float(loss_seq(stacked)), rtol=1e-5)
    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_circular_pipeline_rejects_too_few_microbatches():
    from taper_tpu.nn.transformer import TransformerBlock
    mesh = parallel.make_mesh(data=2, model=4)
    blk = TransformerBlock(8, num_heads=2, causal=True)
    stacked = parallel.stack_layer_params(
        [blk.init(k) for k in jax.random.split(jax.random.PRNGKey(0), 8)])
    x_mb = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 8))
    import pytest
    with pytest.raises(AssertionError):
        parallel.pipeline_apply_circular(mesh, blk.apply, stacked, x_mb,
                                         repeats=2)
