"""Paged KV-cache ops (ops/pallas/paged_attention.py).

The Pallas kernel (run through the interpreter on the CPU mesh, same
code path as on TPU) is checked against the XLA gather oracle, and the
oracle against a dense full-cache reference, over fragmented /
shuffled / oversubscribed block tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taper_tpu.ops.pallas import paged_attention as PA


def _rand_paged_case(key, b=4, kvh=2, g=8, d=64, bs=16, mb=4,
                     n_blocks=None, dtype=jnp.float32):
    """Random pools + a VALID paged layout: each slot owns `mb` distinct
    blocks, slots never share, allocation order shuffled (fragmented)."""
    n_blocks = n_blocks or (b * mb + 3)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, kvh, g, d), dtype)
    k_pool = jax.random.normal(ks[1], (n_blocks, kvh, bs, d), dtype)
    v_pool = jax.random.normal(ks[2], (n_blocks, kvh, bs, d), dtype)
    perm = np.asarray(jax.random.permutation(ks[3], n_blocks))
    tables = jnp.asarray(perm[:b * mb].reshape(b, mb), jnp.int32)
    lengths = jnp.asarray(
        np.asarray(jax.random.randint(ks[4], (b,), 1, mb * bs + 1)),
        jnp.int32)
    return q, k_pool, v_pool, tables, lengths


def _dense_reference(q, k_pool, v_pool, tables, lengths):
    """Per-slot numpy softmax attention over the gathered valid rows."""
    qn, kp, vp = (np.asarray(x, np.float64) for x in (q, k_pool, v_pool))
    tb, ln = np.asarray(tables), np.asarray(lengths)
    b, kvh, g, d = qn.shape
    bs = kp.shape[2]
    out = np.zeros_like(qn)
    for i in range(b):
        rows_k = np.concatenate([kp[t, :, :, :] for t in tb[i]], axis=1)
        rows_v = np.concatenate([vp[t, :, :, :] for t in tb[i]], axis=1)
        rows_k, rows_v = rows_k[:, :ln[i]], rows_v[:, :ln[i]]
        for h in range(kvh):
            s = qn[i, h] @ rows_k[h].T * (d ** -0.5)
            p = np.exp(s - s.max(axis=1, keepdims=True))
            p /= p.sum(axis=1, keepdims=True)
            out[i, h] = p @ rows_v[h]
    return out


def test_xla_oracle_matches_dense_reference():
    case = _rand_paged_case(jax.random.PRNGKey(0))
    q, kp, vp, tb, ln = case
    o = PA.paged_decode_attention(q, kp, vp, tb, ln,
                                  scale=q.shape[-1] ** -0.5, impl="xla")
    ref = _dense_reference(q, kp, vp, tb, ln)
    np.testing.assert_allclose(np.asarray(o), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("g", [1, 4, 8])
def test_pallas_kernel_matches_oracle(dtype, g):
    case = _rand_paged_case(jax.random.PRNGKey(1), g=g, dtype=dtype)
    q, kp, vp, tb, ln = case
    scale = q.shape[-1] ** -0.5
    o_k = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="pallas")
    o_x = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="xla")
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(o_k, np.float32),
                               np.asarray(o_x, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("mb,nsub", [(3, 4), (5, 4), (4, 2), (4, 1)])
def test_pallas_kernel_table_padding(mb, nsub):
    """Table widths not divisible by nsub go through the pad-and-clamp
    path; every (mb, nsub) combination must match the oracle."""
    case = _rand_paged_case(jax.random.PRNGKey(7), mb=mb)
    q, kp, vp, tb, ln = case
    scale = q.shape[-1] ** -0.5
    o_k = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="pallas", nsub=nsub)
    o_x = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="xla")
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_x),
                               rtol=2e-5, atol=2e-5)


def test_pallas_kernel_boundary_lengths():
    """Exact block-boundary lengths (bs, 2·bs) and length 1."""
    q, kp, vp, tb, _ = _rand_paged_case(jax.random.PRNGKey(2))
    bs = kp.shape[2]
    ln = jnp.asarray([1, bs, 2 * bs, bs + 1], jnp.int32)
    scale = q.shape[-1] ** -0.5
    o_k = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="pallas")
    o_x = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="xla")
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_x),
                               rtol=2e-5, atol=2e-5)


def test_garbage_blocks_never_leak():
    """Poison every block NOT referenced below a slot's length with huge
    values — output must be unaffected (mask + clamp correctness)."""
    q, kp, vp, tb, ln = _rand_paged_case(jax.random.PRNGKey(3))
    scale = q.shape[-1] ** -0.5
    bs = kp.shape[2]
    base_k = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                       impl="pallas")
    kp2, vp2 = np.asarray(kp).copy(), np.asarray(vp).copy()
    used = set()
    for i in range(tb.shape[0]):
        nb = -(-int(ln[i]) // bs)
        used |= set(int(t) for t in np.asarray(tb)[i, :nb])
    for blk in range(kp2.shape[0]):
        if blk not in used:
            kp2[blk] = 1e9
            vp2[blk] = 1e9
    # also poison the tail of each slot's LAST valid block
    for i in range(tb.shape[0]):
        nb = -(-int(ln[i]) // bs)
        tail = int(ln[i]) - (nb - 1) * bs
        if tail < bs:
            kp2[int(tb[i, nb - 1]), :, tail:] = 1e9
            vp2[int(tb[i, nb - 1]), :, tail:] = 1e9
    poisoned = PA.paged_decode_attention(q, jnp.asarray(kp2),
                                         jnp.asarray(vp2), tb, ln,
                                         scale=scale, impl="pallas")
    np.testing.assert_allclose(np.asarray(poisoned), np.asarray(base_k),
                               rtol=1e-6, atol=1e-6)


def test_pallas_kernel_quantized_matches_oracle():
    """int8 pools + per-position scales: kernel vs gather oracle."""
    q, kp_f, vp_f, tb, ln = _rand_paged_case(jax.random.PRNGKey(11))
    nb, kvh, bs, d = kp_f.shape
    ks = jax.random.uniform(jax.random.PRNGKey(12), (nb, kvh, bs),
                            minval=0.005, maxval=0.02)
    vs = jax.random.uniform(jax.random.PRNGKey(13), (nb, kvh, bs),
                            minval=0.005, maxval=0.02)
    kp = jnp.clip(jnp.round(kp_f * 30), -127, 127).astype(jnp.int8)
    vp = jnp.clip(jnp.round(vp_f * 30), -127, 127).astype(jnp.int8)
    scale = d ** -0.5
    o_k = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="pallas", k_scales=ks,
                                    v_scales=vs)
    o_x = PA.paged_decode_attention(q, kp, vp, tb, ln, scale=scale,
                                    impl="xla", k_scales=ks,
                                    v_scales=vs)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_x),
                               rtol=2e-5, atol=2e-5)


def test_paged_write_decode_rows():
    """paged_write puts each slot's row exactly at (table[pos//bs],
    pos%bs) and touches nothing else."""
    b, kvh, d, bs, mb = 3, 2, 8, 4, 3
    n_blocks = b * mb
    kp = jnp.zeros((n_blocks, kvh, bs, d))
    vp = jnp.zeros_like(kp)
    tables = jnp.arange(n_blocks, dtype=jnp.int32).reshape(b, mb)[::-1]
    pos = jnp.asarray([0, 5, 9], jnp.int32)        # blocks 0, 1, 2
    k = jnp.arange(b * kvh * d, dtype=jnp.float32).reshape(b, kvh, 1, d)
    v = -k
    kp2, vp2 = PA.paged_write(kp, vp, k, v, tables, pos)
    kp2, vp2 = np.asarray(kp2), np.asarray(vp2)
    total = 0
    for i in range(b):
        blk = int(tables[i, int(pos[i]) // bs])
        off = int(pos[i]) % bs
        np.testing.assert_array_equal(kp2[blk, :, off],
                                      np.asarray(k)[i, :, 0])
        np.testing.assert_array_equal(vp2[blk, :, off],
                                      np.asarray(v)[i, :, 0])
        total += 1
    assert (np.abs(kp2).sum() ==
            np.abs(np.asarray(k)).sum()), "extra rows written"


def test_paged_write_prefill_blocks():
    """Prefill scatter lands P rows across ceil(P/bs) blocks in order."""
    kvh, d, bs = 2, 8, 4
    n_blocks = 6
    kp = jnp.zeros((n_blocks, kvh, bs, d))
    vp = jnp.zeros_like(kp)
    p = 10                                          # 3 blocks, tail 2
    k = jnp.arange(kvh * p * d, dtype=jnp.float32).reshape(kvh, p, d)
    v = k + 0.5
    table_row = jnp.asarray([5, 0, 3, 1], jnp.int32)
    kp2, vp2 = PA.paged_write_prefill(kp, vp, k, v, table_row)
    kp2 = np.asarray(kp2)
    for j in range(3):
        rows = np.asarray(k)[:, j * bs:(j + 1) * bs]
        got = kp2[int(table_row[j])][:, :rows.shape[1]]
        np.testing.assert_array_equal(got, rows)
    assert np.abs(kp2[2]).sum() == 0 and np.abs(kp2[4]).sum() == 0
