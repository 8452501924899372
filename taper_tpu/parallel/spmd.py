"""Explicit-collective SPMD training step (``shard_map`` + ``pmean``).

The GSPMD path in ``mesh.py`` lets XLA infer collectives from sharding
annotations.  This module is the explicit alternative — the program states
its communication: each device computes gradients on its batch shard, then
all-reduces them over the ``data`` axis with ``jax.lax.pmean`` (lowered to
an XLA all-reduce riding ICI on real slices).  Useful when you want the
collective schedule pinned down rather than inferred, and as the direct
analogue of what a NCCL all-reduce would be in a GPU stack (the reference
has neither — SURVEY.md §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from taper_tpu import losses as L


def make_dp_train_step(model, optimizer, mesh: Mesh,
                       loss_fn=L.cross_entropy_loss):
    """Data-parallel train step with explicit gradient all-reduce.

    Params/optimizer state are replicated; the batch is sharded over
    ``data``.  Returns a jitted ``step(params, opt_state, x, y) ->
    (params, opt_state, loss, acc)``.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def step(params, opt_state, x, y):
        def loss_of(p):
            logits = model.apply(p, x, train=True)
            return loss_fn(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        # The explicit ICI collective: mean-reduce grads across devices.
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        acc = jax.lax.pmean(L.accuracy(logits, y), "data")
        params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1))


def replicate_to_mesh(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch_to_mesh(x, y, mesh: Mesh):
    s = NamedSharding(mesh, P("data"))
    return (jax.device_put(jnp.asarray(x), s),
            jax.device_put(jnp.asarray(y), s))


def sharded_attention(mesh: Mesh, q, k, v, *, causal=False, scale=None,
                      kernel=None):
    """Flash attention over a mesh: batch on ``data``, heads on ``model``.

    Attention is embarrassingly parallel over (batch, heads) — no
    collectives needed — so the Pallas kernel composes with ``shard_map``
    directly: each device runs the kernel on its local ``[B/dp, H/tp, S,
    D]`` shard.  This is the manual-partitioning path for the custom
    kernel (GSPMD cannot see inside a ``pallas_call``); the jnp oracle
    path needs no wrapper — GSPMD partitions it from the shardings alone.
    """
    if kernel is None:
        from taper_tpu.ops.pallas.attention import flash_attention
        kernel = lambda q, k, v: flash_attention(q, k, v, causal, scale)
    spec = P("data", "model", None, None)
    fn = jax.shard_map(kernel, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def sequence_parallel_attention(mesh: Mesh, q, k, v, *, causal=False,
                                scale=None, axis="model", window=None):
    """Context/sequence parallelism for attention: Q, K and V are sharded
    over the SEQUENCE axis on ``axis``; each device all-gathers K/V over
    ICI (the standard all-gather SP recipe for moderate S) and runs the
    flash kernel on its local Q shard with its global causal offset —
    the kernel's ``q_offset`` keeps the causal mask and the block-skip
    logic globally correct.  Per-device attention memory drops from
    O(S·D) to O(S·D/n) for Q/O (K/V transiently gathered).

    The local Q length must be a multiple of 128 (kernel block).
    """
    def local(q, k, v):
        i = jax.lax.axis_index(axis)
        kg = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        from taper_tpu.ops.pallas.attention import flash_attention
        return flash_attention(q, kg, vg, causal, scale,
                               q_offset=i * q.shape[2], window=window)
    spec = P(None, None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def ring_attention(mesh: Mesh, q, k, v, *, causal=False, scale=None,
                   axis="model", window=None):
    """Ring attention: Q, K and V all stay sharded over the sequence on
    ``axis`` — no device ever materializes the full K/V (memory O(S/n),
    unlike the all-gather variant).  Each step computes flash attention
    of the local Q shard against the currently-held K/V chunk (with
    global q/k offsets keeping causality exact), merges the partial
    result through a streaming logsumexp, and rotates the chunk to the
    next device with ``lax.ppermute`` over ICI.  Differentiable: the
    merge consumes the kernel's (o, lse) pair, whose VJP folds the lse
    cotangent into the flash backward's delta; scan + ppermute transpose
    handles the ring reversal.

    Local sequence length must be a multiple of 128.
    """
    n = int(mesh.shape[axis])
    from taper_tpu.ops.pallas.attention import flash_attention_lse

    def local(q, k, v):
        i = jax.lax.axis_index(axis)
        b, h, sq_l, d = q.shape
        perm = [(s, (s + 1) % n) for s in range(n)]

        def step(carry, j):
            k_c, v_c, num, den, m = carry
            koff = ((i - j) % n) * sq_l
            o_j, lse_j = flash_attention_lse(
                q, k_c, v_c, causal, scale,
                q_offset=i * sq_l, k_offset=koff, window=window)
            lse_j = lse_j.reshape(b, h, sq_l, 1)
            m_new = jnp.maximum(m, lse_j)
            corr = jnp.exp(m - m_new)
            w = jnp.exp(lse_j - m_new)
            num = num * corr + o_j.astype(jnp.float32) * w
            den = den * corr + w
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            return (k_c, v_c, num, den, m_new), None

        num0 = jnp.zeros((b, h, sq_l, d), jnp.float32)
        den0 = jnp.zeros((b, h, sq_l, 1), jnp.float32)
        m0 = jnp.full((b, h, sq_l, 1), -jnp.inf, jnp.float32)
        (k_c, v_c, num, den, m), _ = jax.lax.scan(
            step, (k, v, num0, den0, m0), jnp.arange(n))
        return (num / den).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def expert_parallel_moe(mesh: Mesh, moe, params, x, *, axis="model"):
    """Expert parallelism for :class:`~taper_tpu.nn.transformer.MoEMLP`:
    the stacked expert params shard over ``axis`` (each device runs
    ``n_experts / n`` experts on the full batch), gates are computed
    locally from the replicated gate weights, and the gate-weighted
    partial sums all-reduce over ICI.  Output == the single-device MoE.

    When the module carries ``capacity_factor`` the per-device compute
    is SPARSE too: each device computes routing globally (cheap, the
    gate is replicated) but builds capacity buffers and runs expert
    FFNs only for its own ``n_experts/n`` experts — per-device expert
    FLOPs are ``top_k·f/n`` of the dense single-device cost, the true
    MoE scaling story.  Equality with the single-device
    ``apply_sparse`` holds exactly (identical global routing, so the
    same slots drop).
    """
    n = int(mesh.shape[axis])
    assert moe.n_experts % n == 0, (moe.n_experts, n)
    e_local = moe.n_experts // n

    def local_dense(gate_w, experts_local, x):
        i = jax.lax.axis_index(axis)
        g = moe.gates({"gate": gate_w}, x)          # [B, S, n_experts]
        ye = jax.vmap(lambda p: moe.expert.apply(p, x))(experts_local)
        g_loc = jax.lax.dynamic_slice_in_dim(g, i * e_local, e_local, 2)
        y = jnp.einsum("nbse,bsn->bse", ye.astype(jnp.float32), g_loc)
        return jax.lax.psum(y, axis).astype(x.dtype)

    def local_sparse(gate_w, experts_local, x):
        # routing/dispatch math is SHARED with MoEMLP.apply_sparse
        # (nn.transformer.moe_sparse_*) — bit-identical global routing
        # is what makes EP equal the single-device path (the same slots
        # overflow and drop everywhere); only the expert-ownership
        # filter differs here.
        from taper_tpu.nn.transformer import (moe_capacity,
                                              moe_sparse_dispatch,
                                              moe_sparse_routing)

        i = jax.lax.axis_index(axis)
        b, s_len, e = x.shape
        t = b * s_len
        cap = moe_capacity(t, moe.n_experts, moe.top_k,
                           moe.capacity_factor)
        x2 = x.reshape(t, e)
        w, expert, pos, keep = moe_sparse_routing(
            gate_w, x2, moe.n_experts, moe.top_k, cap)
        # slots routed to THIS device's experts only
        mine = keep & (expert >= i * e_local) \
            & (expert < (i + 1) * e_local)
        y2 = moe_sparse_dispatch(
            x2, expert, pos, mine, w, cap, e_local, i * e_local,
            moe.expert.apply, experts_local)
        y = y2.reshape(b, s_len, e)
        return jax.lax.psum(y, axis).astype(x.dtype)

    local = (local_sparse if getattr(moe, "capacity_factor", None)
             is not None else local_dense)
    spec_e = jax.tree.map(
        lambda leaf: P(*(axis,) + (None,) * (leaf.ndim - 1)),
        params["experts"])
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), spec_e, P()), out_specs=P(),
                       check_vma=False)
    return fn(params["gate"], params["experts"], x)


def ulysses_attention(mesh: Mesh, q, k, v, *, causal=False, scale=None,
                      axis="model"):
    """Ulysses-style sequence parallelism: inputs arrive sequence-sharded
    ``[B, H, S/n, D]``; an all-to-all reshards to head-sharded
    ``[B, H/n, S, D]`` so each device runs the flash kernel over the FULL
    sequence for its head slice (no causal-offset bookkeeping, perfect
    load balance), and a second all-to-all brings the output back to
    sequence-sharded.  Requires ``H % n == 0``; communication is two
    all-to-alls of the activation size over ICI (vs the ring's n-1
    K/V hops).
    """
    n = int(mesh.shape[axis])
    assert q.shape[1] % n == 0, (q.shape, n)

    def local(q, k, v):
        def to_heads(t):
            # [B, H, S/n, D] local -> [B, H/n, S, D] local
            return jax.lax.all_to_all(t, axis, split_axis=1,
                                      concat_axis=2, tiled=True)
        from taper_tpu.ops.pallas.attention import flash_attention
        o = flash_attention(to_heads(q), to_heads(k), to_heads(v),
                            causal, scale)
        # [B, H/n, S, D] -> [B, H, S/n, D]
        return jax.lax.all_to_all(o, axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def vocab_parallel_cross_entropy(mesh: Mesh, logits, targets, *,
                                 axis="model", valid=None):
    """Cross-entropy over VOCAB-SHARDED logits — no logits all-gather.

    With a Megatron column-parallel LM head (``parallel/serving.py``
    shards the tied head over vocab), the natural training loss would
    all-gather the ``[N, V]`` logits to every model shard before the
    softmax — at production vocabs that single collective dwarfs the
    loss math.  This computes mean NLL directly on the shards: each
    device reduces its local ``[N, V/t]`` slab, then two scalar-per-row
    collectives (``pmax`` for the stable max, ``psum`` for the exp-sum
    and for the target logit, which lives on exactly one shard) produce
    the exact same loss as the replicated softmax.  Communication is
    ``O(N)`` instead of ``O(N·V)``.

    ``logits``: ``[N, V]`` global, sharded over ``axis`` on the last
    dim (pass the global array; ``shard_map`` hands each device its
    slab).  ``targets``: ``[N]`` int, replicated.  ``valid``: optional
    ``[N]`` bool/float mask — loss averages over valid rows only (the
    padded-token idiom).  Differentiable: the backward is the usual
    ``softmax − onehot``, computed shard-locally.

    The reference has no distributed anything (SURVEY.md §2.9); this is
    the TP counterpart of ``losses.cross_entropy_loss`` and composes
    with ``losses.fused_linear_cross_entropy``'s role the way
    Megatron-LM's vocab-parallel loss does with its fused head.
    """
    t = int(mesh.shape[axis])
    n, v_total = logits.shape
    assert v_total % t == 0, (logits.shape, t)
    chunk = v_total // t

    def local(lg, tgt, w):
        idx = jax.lax.axis_index(axis)
        # stable max over the full vocab.  NOT pmax: it has no JAX
        # differentiation rule; all_gather of the [N] per-device maxima
        # is O(N·t) bytes and transposes cleanly (the max's gradient
        # contribution cancels in lse − tl anyway).
        m = jnp.max(jax.lax.all_gather(jnp.max(lg, axis=-1), axis),
                    axis=0)
        se = jax.lax.psum(
            jnp.sum(jnp.exp(lg - m[:, None]), axis=-1), axis)
        lse = m + jnp.log(se)
        # the target's logit lives on exactly one shard: gather it
        # locally where in-range, zero elsewhere, and psum
        loc = tgt - idx * chunk
        in_range = (loc >= 0) & (loc < chunk)
        safe = jnp.clip(loc, 0, chunk - 1)
        tl = jnp.take_along_axis(lg, safe[:, None], axis=1)[:, 0]
        tl = jax.lax.psum(jnp.where(in_range, tl, 0.0), axis)
        return jnp.sum((lse - tl) * w) / jnp.maximum(jnp.sum(w), 1.0)

    w = (jnp.ones((n,), logits.dtype) if valid is None
         else valid.astype(logits.dtype))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None), P(None)),
        out_specs=P(), check_vma=False)
    return fn(logits, targets, w)
