"""Tensor-parallel serving: sharded generation over a device mesh.

The reference has no serving story at all (SURVEY.md §5.8: no
distributed backend; inference = a plain forward).  On TPU the
production recipe for models too large (or too latency-sensitive) for
one chip is Megatron-style tensor parallelism under GSPMD: annotate
each weight with the axis it splits on, hand XLA the sharded params,
and let it insert the all-reduces — one per block, riding ICI.

Sharding rules for :class:`~taper_tpu.models.transformer.TinyGPT`
(weights are ``[out, in]``; ``_proj`` computes ``x @ w.T``):

* ``wq/wk/wv`` — COLUMN-parallel: out-features (= concatenated heads,
  contiguous rows per head) split over ``model``; each device projects
  its own head slice, so attention itself needs no communication (it
  is embarrassingly parallel over heads).  Biases follow.
* ``wo`` — ROW-parallel: in-features split over ``model``; each
  device contracts its local head slice and the partial sums
  all-reduce (this + the mirror in the MLP are the block's only two
  collectives).  ``bo`` replicated (added once, after the reduce).
* ``w1/b1`` column-parallel, ``w2`` row-parallel, ``b2`` replicated —
  the classic Megatron MLP split.
* MoE experts: the same split applied per expert (the stacked
  ``[n_experts, ...]`` leaves shard their hidden dim); the gate is
  replicated.
* token embedding / untied head ``[V, D]`` — vocab-split over
  ``model`` (parallel LM head: each device scores its vocab slice;
  XLA gathers logits only where a sampler consumes them).
* LayerNorms, position table, everything 1-ulp-sized — replicated.

The KV cache is created *inside* the jitted generate, so GSPMD
propagates the head sharding into it from the k/v projections: each
device stores only its ``kv_heads / tp`` slice of the cache — cache
memory AND decode-time cache reads scale down with TP, which is what
makes long-context serving fit.

Everything here also runs on the CPU "virtual TPU" mesh for tests.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path, shape, tp: int, axis: str):
    """Megatron-style PartitionSpec for one named leaf (see module doc)."""
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path
            if not hasattr(k, "idx")]
    name = keys[-1] if keys else None
    parent = keys[-2] if len(keys) >= 2 else None
    nd = len(shape)

    def col(d):      # split dim d over `axis` when divisible
        if shape[d] % tp == 0 and shape[d] >= tp:
            s = [None] * nd
            s[d] = axis
            return P(*s)
        return P()

    if tp == 1:
        return P()
    if name in ("wq", "wk", "wv", "w1", "w3", "b1", "b3",
                "bq", "bk", "bv"):
        return col(nd - 2 if name.startswith("w") else nd - 1)
    if name in ("wo", "w2"):
        return col(nd - 1)
    if name in ("bo", "b2", "g", "b", "gate"):
        return P()
    if name == "w" and parent == "tok":
        return col(0)           # vocab-parallel embedding + tied head
    if name == "head":
        return col(0)
    return P()


def tp_sharding(mesh: Mesh, params, axis: str = "model"):
    """NamedSharding pytree for TinyGPT params under tensor parallelism.

    Name-based rules (see module docstring); anything unrecognized —
    and any dim the TP degree doesn't divide — is replicated, so the
    result is always valid (worst case: no parallelism for that leaf).
    """
    tp = int(mesh.shape.get(axis, 1))

    def rule(path, leaf):
        return NamedSharding(mesh,
                             _spec_for(path, np.shape(leaf), tp, axis))

    return jax.tree_util.tree_map_with_path(rule, params)


def tp_place(mesh: Mesh, params, axis: str = "model"):
    """Place params onto the mesh under :func:`tp_sharding`."""
    return jax.tree.map(jax.device_put, params,
                        tp_sharding(mesh, params, axis))


def make_tp_generate(model, mesh: Mesh, *, axis: str = "model",
                     data_axis: str = "data", **generate_kw):
    """Compile ``model.generate`` for tensor-parallel serving.

    Returns ``fn(params, prompt, max_new) -> tokens`` jitted with the
    TP param shardings pinned as ``in_shardings`` (params may be placed
    already via :func:`tp_place` or arrive host-side; jit moves them
    once and keeps them resident).  The prompt batch shards over
    ``data_axis`` when the mesh has one (DP serving composes with TP
    for free); ``generate_kw`` is closed over (sampling knobs, eos,
    quantized_cache, ...).  ``max_new`` is static per compilation.
    """
    dp = int(mesh.shape.get(data_axis, 1))
    cache = {}

    def fn(params, prompt, max_new: int):
        batch_sharded = dp > 1 and prompt.shape[0] % dp == 0
        key = (int(max_new), batch_sharded)
        if key not in cache:
            pspec = P(data_axis) if batch_sharded else P()
            shardings = tp_sharding(mesh, params, axis)
            cache[key] = jax.jit(
                functools.partial(model.generate, max_new=key[0],
                                  **generate_kw),
                in_shardings=(shardings, NamedSharding(mesh, pspec)))
        return cache[key](params, prompt)

    return fn


def tp_generate(mesh: Mesh, model, params, prompt, max_new: int,
                axis: str = "model", **generate_kw):
    """One-call tensor-parallel generation (see :func:`make_tp_generate`
    for the persistent-serving form)."""
    return make_tp_generate(model, mesh, axis=axis, **generate_kw)(
        params, prompt, max_new)
