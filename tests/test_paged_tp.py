"""Paged KV cache under tensor parallelism (8-device CPU mesh).

Attention is embarrassingly parallel over KV heads, so the paged pools
shard over the ``model`` axis exactly like the contiguous TP cache:

* GSPMD route — jit ``decode_step_paged`` with the pools sharded on
  their kvh dim and Megatron-sharded params (``impl="xla"``: einsums
  and gathers partition; a Pallas custom call would not).
* shard_map route — the Pallas kernel runs per device on its local
  head shard (same pattern as the ring/sharded flash attention).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from taper_tpu import models, ops
from taper_tpu.ops.pallas import paged_attention as PA
from taper_tpu.parallel.mesh import make_mesh
from taper_tpu.parallel.serving import tp_place


def _fragmented_tables(key, b, mb, n_blocks):
    perm = np.asarray(jax.random.permutation(key, n_blocks))
    return jnp.asarray(perm[:b * mb].reshape(b, mb), jnp.int32)


def test_paged_kernel_under_shard_map_over_heads():
    mesh = make_mesh(model=8)
    b, kvh, g, d, bs, mb = 4, 8, 2, 64, 16, 4
    n_blocks = b * mb + 2
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, kvh, g, d))
    kp = jax.random.normal(ks[1], (n_blocks, kvh, bs, d))
    vp = jax.random.normal(ks[2], (n_blocks, kvh, bs, d))
    tables = _fragmented_tables(ks[3], b, mb, n_blocks)
    lengths = jnp.asarray(
        np.asarray(jax.random.randint(ks[4], (b,), 1, mb * bs + 1)),
        jnp.int32)
    scale = d ** -0.5

    ref = PA.paged_decode_attention(q, kp, vp, tables, lengths,
                                    scale=scale, impl="pallas")

    def local(q, kp, vp, tables, lengths):
        # per-device: the kvh/8 head shard, full tables/lengths
        return PA.paged_decode_attention(q, kp, vp, tables, lengths,
                                         scale=scale, impl="pallas")

    hs = P(None, "model", None, None)
    got = jax.shard_map(local, mesh=mesh,
                        in_specs=(hs, hs, hs, P(None, None), P(None)),
                        out_specs=hs, check_vma=False)(q, kp, vp, tables, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_paged_decode_matches_single_device():
    """Full decode under GSPMD: Megatron-sharded params + kvh-sharded
    paged pools; tokens equal the unsharded paged path, and every pool
    leaf is genuinely sharded over the model axis."""
    ops.set_backend("xla")
    mesh = make_mesh(model=4)
    model = models.TinyGPT(vocab_size=31, dim=64, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    b, p, steps, bs = 2, 9, 6, 8
    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, p), 0, 31)
    mb = -(-(p + steps) // bs)
    n_blocks = b * mb + 2
    tables = _fragmented_tables(jax.random.PRNGKey(2), b, mb, n_blocks)

    # single-device oracle
    pools = model.init_paged_cache(n_blocks, block_size=bs)
    lg, pools = model.prefill_paged(params, prompt, pools, tables)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    ref_toks = [np.asarray(tok)]
    pos = jnp.full((b,), p, jnp.int32)
    for _ in range(steps):
        lg2, pools = model.decode_step_paged(params, tok, pos, pools,
                                             tables)
        tok = jnp.argmax(lg2, -1).astype(jnp.int32)
        ref_toks.append(np.asarray(tok))
        pos = pos + 1

    # TP: params Megatron-sharded, pools sharded over kvh
    tp_params = tp_place(mesh, params)
    pool_sh = NamedSharding(mesh, P(None, "model", None, None))
    tp_pools = [
        {k: jax.device_put(v, pool_sh) for k, v in pl.items()}
        for pl in model.init_paged_cache(n_blocks, block_size=bs)]
    prefill = jax.jit(lambda pr, pm, po:
                      model.prefill_paged(pm, pr, po, tables))
    step = jax.jit(lambda t, q, pm, po:
                   model.decode_step_paged(pm, t, q, po, tables,
                                           impl="xla"))
    with mesh:
        lg, tp_pools = prefill(prompt, tp_params, tp_pools)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        got = [np.asarray(tok)]
        pos = jnp.full((b,), p, jnp.int32)
        for _ in range(steps):
            lg2, tp_pools = step(tok, pos, tp_params, tp_pools)
            tok = jnp.argmax(lg2, -1).astype(jnp.int32)
            got.append(np.asarray(tok))
            pos = pos + 1
    np.testing.assert_array_equal(np.stack(got), np.stack(ref_toks))
    # pools stayed sharded over the model axis (cache memory scales
    # down with TP)
    k_shard = tp_pools[0]["k"].sharding
    assert "model" in (k_shard.spec[1],), k_shard.spec
