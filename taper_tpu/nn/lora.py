"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

Beyond the reference (which has no fine-tuning story at all); included
because a production framework's serving models are overwhelmingly tuned
this way (Hu et al., 2021, arXiv:2106.09685).

The design is a pure *pytree transform*, matching the functional module
system (``nn/module.py``): no layer classes are wrapped or re-built.

* ``lora.init(key, base_params)`` returns a tree with the SAME structure
  whose matched 2-D weight leaves become ``{"a": [r, in], "b": [out, r]}``
  factor pairs (``b`` zero-init, so the adapted model starts exactly at
  the base model) and all other leaves become ``None``.
* ``lora.patch(base_params, lora_params)`` returns a params tree where
  every matched leaf is ``W + (alpha/r) * b @ a`` — call the original
  ``model.apply(patched, x)`` unchanged.  Under ``jit`` the rank-r
  product adds ``out*in*r`` FLOPs per weight (negligible at r≪dim) and
  XLA fuses the add into the consumer matmul's operand stream.
* Training differentiates ``loss(lora_p) = f(patch(base, lora_p))`` so
  gradients and **optimizer state exist only for the factors** — the
  memory win that motivates LoRA (Adam m/v for 2·r·(in+out) instead of
  in·out numbers per weight).  The base tree is a closed-over constant;
  nothing needs the optimizer's frozen-leaf masking.
* ``lora.merge(base_params, lora_params)`` materializes the patched tree
  once for serving (zero inference overhead thereafter).

TPU notes: the per-step patch is one small MXU matmul per adapted weight
plus an HBM-bandwidth add; both fuse into the existing step program.  On
a mesh, factors inherit the base weight's sharding rule by construction
(``a`` row-sharded like W's columns, ``b`` like W's rows) when the
patched tree is what ``pjit`` sees.

QLoRA: a PTQ-quantized base tree (``quantization.ptq.quantize_params``
— int8/int4/NF4 ``QuantizedTensor`` leaves) works directly: ``init``
factors quantized 2-D weights by their logical shape and ``patch``
dequantizes inside the traced step, so the base stays quantized in HBM
and each dense ``W + Δ`` exists only transiently at its consumer matmul
(XLA buffer liveness) — Dettmers et al. 2023, arXiv:2305.14314.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _leaf_name(path) -> str:
    last = path[-1]
    for attr in ("key", "name", "idx"):
        if hasattr(last, attr):
            return str(getattr(last, attr))
    return str(last)


def _path_str(path) -> str:
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def _is_quantized(x) -> bool:
    from taper_tpu.quantization.qtensor import QuantizedTensor
    return isinstance(x, QuantizedTensor)


def default_match(path, leaf) -> bool:
    """Adapt 2-D weight leaves whose name starts with ``w`` (the
    framework convention: ``w, wq, wk, wv, wo, w1, w2``), skipping
    embedding tables (``tok``/``pos``/``emb`` anywhere in the path) —
    the standard LoRA target set (attention + MLP projections).
    ``QuantizedTensor`` leaves match by their logical shape (QLoRA)."""
    if len(tuple(getattr(leaf, "shape", ()))) != 2:
        return False
    if not _leaf_name(path).startswith("w"):
        return False
    lowered = _path_str(path).lower()
    return not any(t in lowered for t in ("tok", "pos", "emb"))


class LoRA:
    def __init__(self, rank: int = 8, alpha: float = 16.0,
                 match: Optional[Callable] = None,
                 exclude: Sequence[str] = ()):
        """``match(path, leaf) -> bool`` selects leaves to adapt
        (default: :func:`default_match`); ``exclude`` drops any path
        containing one of the given substrings on top of that."""
        if rank < 1:
            raise ValueError(f"rank must be >= 1, got {rank}")
        self.rank = rank
        self.alpha = float(alpha)
        self._match = match or default_match
        self.exclude = tuple(exclude)

    def _selected(self, path, leaf) -> bool:
        if not self._match(path, leaf):
            return False
        p = _path_str(path).lower()
        return not any(t in p for t in self.exclude)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank

    def init(self, key, base_params):
        """Factor tree: ``{"a","b"}`` at matched leaves, ``None`` elsewhere.

        ``a`` ~ N(0, 1/r) (He-style over the rank contraction), ``b`` = 0
        so ``patch(base, init(...)) == base`` exactly.  Quantized base
        leaves get f32 factors (QLoRA: the adapter trains in float on
        top of the frozen quantized weight).
        """
        paths = jax.tree_util.tree_flatten_with_path(
            base_params, is_leaf=_is_quantized)[0]
        n_sel = sum(self._selected(p, l) for p, l in paths) or 1
        keys = iter(jax.random.split(key, n_sel))

        def factorize(path, leaf):
            if not self._selected(path, leaf):
                return None
            out_f, in_f = leaf.shape
            dtype = (jnp.float32 if _is_quantized(leaf)
                     else leaf.dtype)
            a = jax.random.normal(next(keys), (self.rank, in_f),
                                  jnp.float32) / jnp.sqrt(self.rank)
            b = jnp.zeros((out_f, self.rank), jnp.float32)
            return {"a": a.astype(dtype), "b": b.astype(dtype)}

        return jax.tree_util.tree_map_with_path(factorize, base_params,
                                                is_leaf=_is_quantized)

    def _is_factor(self, x) -> bool:
        return isinstance(x, dict) and set(x) == {"a", "b"}

    def patch(self, base_params, lora_params):
        """Base tree with matched leaves replaced by ``W + scale·(b@a)``.

        Pure and jit-friendly; differentiate wrt ``lora_params`` only.
        Quantized base leaves dequantize inside the trace (QLoRA): the
        stored tree keeps the int8/int4/NF4 bytes, the dense sum exists
        only as a transient at its consumer.
        """
        def add(f, w):
            if f is None:
                return w
            if _is_quantized(w):
                w = w.dequantize()
            delta = (f["b"].astype(jnp.float32)
                     @ f["a"].astype(jnp.float32)) * self.scale
            return w + delta.astype(w.dtype)

        # Traverse the factor tree (whose leaves are None / {"a","b"}
        # dicts per is_leaf); the base tree rides along positionally.
        return jax.tree.map(add, lora_params, base_params,
                            is_leaf=lambda x: x is None
                            or self._is_factor(x))

    def merge(self, base_params, lora_params):
        """Materialized patched tree for serving (adapter folded in)."""
        return jax.tree.map(lambda x: x, self.patch(base_params,
                                                    lora_params))

    def param_count(self, lora_params) -> int:
        return sum(l.size for l in jax.tree_util.tree_leaves(lora_params))

    # -- multi-adapter (banked) serving -------------------------------------

    def stack_adapters(self, adapters):
        """Stack N factor trees into a BANK tree: matched leaves become
        ``{"a": [N, r, in], "b": [N, out, r]}`` — the weight store for
        multi-tenant serving (:meth:`bank_patch`)."""
        assert adapters, "need at least one adapter"

        def stack(*leaves):
            if leaves[0] is None:
                return None
            return {"a": jnp.stack([l["a"] for l in leaves]),
                    "b": jnp.stack([l["b"] for l in leaves])}

        return jax.tree.map(stack, *adapters,
                            is_leaf=lambda x: x is None
                            or self._is_factor(x))

    def bank_patch(self, base_params, bank, row_ids):
        """Params tree whose matched leaves are :class:`BankedLoRA`
        wrappers: each INPUT ROW of every adapted projection applies its
        own adapter ``row_ids[row]`` (−1 = base weights only) — S-LoRA
        style multi-tenant decoding, one batched program for all
        tenants.  ``row_ids`` must align with the flattened row dim of
        the projections' inputs (decode: [B]; a one-row prefill of
        length P: ``jnp.full((P,), id)``).  The base matmul runs once
        for the whole batch; each adapter adds two rank-r contractions
        per row (negligible at decode batch sizes)."""
        row_ids = jnp.asarray(row_ids, jnp.int32)

        def wrap(f, w):
            if f is None:
                return w
            return BankedLoRA(w, f["a"], f["b"], row_ids, self.scale)

        return jax.tree.map(wrap, bank, base_params,
                            is_leaf=lambda x: x is None
                            or self._is_factor(x))


@jax.tree_util.register_pytree_node_class
class BankedLoRA:
    """A projection weight carrying PER-ROW LoRA adapters (see
    :meth:`LoRA.bank_patch`).  Consumed by ``nn.transformer._proj``,
    which computes ``x@Wᵀ + scale·(x@a[id]ᵀ)@b[id]ᵀ`` row-wise;
    ``ids`` < 0 rows get the base weight only.  A pytree node so it
    flows through jit/scan like any other params leaf."""

    def __init__(self, w, a, b, ids, scale):
        self.w, self.a, self.b, self.ids = w, a, b, ids
        self.scale = float(scale)

    @property
    def shape(self):
        return self.w.shape

    @property
    def dtype(self):
        return self.w.dtype

    def tree_flatten(self):
        return (self.w, self.a, self.b, self.ids), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])
