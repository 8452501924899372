"""Mixed-precision policy + loss scaling (beyond-reference: the
reference is f32-only end to end, ``src/tensor.rs:236-244``).

On TPU the house recipe needs NO loss scaling: bf16 shares f32's
exponent range, so the trunk runs bf16 (single-pass MXU) with f32
params/norms — which is what ``TinyGPT(compute_dtype=jnp.bfloat16)``
and the CNN models already do.  This module makes that recipe a
first-class, reusable object (``Policy``), and adds the loss-scaling
machinery (static + dynamic) that float16 — the narrow-exponent format
used when porting to non-TPU backends, or when the f16 storage PTQ
formats are trained through — genuinely requires.

Everything is functional and jit-safe: the dynamic scale is an array
state threaded through the step (no recompilation as it adjusts), and
the skip-on-overflow update is a ``jnp.where`` select, not control
flow.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

_ABBREV = {
    "f32": jnp.float32, "float32": jnp.float32,
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
    "f16": jnp.float16, "float16": jnp.float16,
    "f64": jnp.float64, "float64": jnp.float64,
}


def _as_dtype(d):
    return _ABBREV[d] if isinstance(d, str) else jnp.dtype(d).type


def _cast_floats(tree, dtype):
    """Cast floating-point leaves; integer/bool leaves pass through."""
    def leaf(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(leaf, tree)


class Policy(NamedTuple):
    """Dtype roles for one model: where params LIVE, what the trunk
    COMPUTES in, and what the model returns.

    ``Policy.from_string("params=float32,compute=bfloat16,output=float32")``
    or the short form ``"p=f32,c=bf16,o=f32"``.
    """
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    @classmethod
    def from_string(cls, s: str) -> "Policy":
        kw = {}
        for part in s.replace(" ", "").split(","):
            if not part:
                continue
            k, v = part.split("=")
            key = {"p": "param_dtype", "params": "param_dtype",
                   "c": "compute_dtype", "compute": "compute_dtype",
                   "o": "output_dtype", "output": "output_dtype"}[k]
            kw[key] = _as_dtype(v)
        return cls(**kw)

    def cast_to_param(self, tree):
        return _cast_floats(tree, self.param_dtype)

    def cast_to_compute(self, tree):
        return _cast_floats(tree, self.compute_dtype)

    def cast_to_output(self, tree):
        return _cast_floats(tree, self.output_dtype)


def tpu_bf16_policy() -> Policy:
    """The standard TPU recipe: f32 master params, bf16 compute, f32
    outputs (losses/logits)."""
    return Policy(jnp.float32, jnp.bfloat16, jnp.float32)


# ---------------------------------------------------------------------------
# Loss scaling
# ---------------------------------------------------------------------------

def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every element of every floating leaf is finite."""
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and
              jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    oks = [jnp.all(jnp.isfinite(x)) for x in leaves]
    return jnp.stack(oks).all()


class LossScaleState(NamedTuple):
    """Functional loss-scale state (arrays, so adjustments don't
    recompile the step)."""
    scale: jnp.ndarray        # f32 scalar
    good_steps: jnp.ndarray   # int32 scalar (dynamic only)


class StaticLossScale:
    """Fixed multiplier: ``loss·S`` forward, ``grads/S`` after."""

    def __init__(self, scale: float):
        self._scale = float(scale)

    def init(self) -> LossScaleState:
        return LossScaleState(jnp.float32(self._scale), jnp.int32(0))

    def scale_loss(self, loss, state: LossScaleState):
        return loss * state.scale.astype(loss.dtype)

    def unscale(self, grads, state: LossScaleState):
        inv = (1.0 / state.scale)
        return jax.tree.map(
            lambda g: (g.astype(jnp.float32) * inv).astype(g.dtype)
            if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)

    def adjust(self, state: LossScaleState, grads_finite) -> LossScaleState:
        return state


class DynamicLossScale(StaticLossScale):
    """The standard dynamic schedule: halve on overflow (non-finite
    grads), double after ``growth_interval`` consecutive finite steps;
    the scale stays in ``[1, max_scale]``."""

    def __init__(self, initial: float = 2.0 ** 15, factor: float = 2.0,
                 growth_interval: int = 2000,
                 max_scale: float = 2.0 ** 24):
        super().__init__(initial)
        self.factor = float(factor)
        self.growth_interval = int(growth_interval)
        self.max_scale = float(max_scale)

    def adjust(self, state: LossScaleState, grads_finite) -> LossScaleState:
        fin = jnp.asarray(grads_finite)
        good = jnp.where(fin, state.good_steps + 1, 0)
        grow = good >= self.growth_interval
        scale = jnp.where(
            fin,
            jnp.where(grow, jnp.minimum(state.scale * self.factor,
                                        self.max_scale), state.scale),
            jnp.maximum(state.scale / self.factor, 1.0))
        good = jnp.where(grow | ~fin, 0, good)
        return LossScaleState(scale.astype(jnp.float32),
                              good.astype(jnp.int32))


def scaled_grad_step(loss_fn, params, ls, ls_state, *args, has_aux=False):
    """One mixed-precision gradient evaluation: scale the loss, take
    grads, unscale, report finiteness, adjust the scale.

    Returns ``(grads, loss, aux, grads_finite, new_ls_state)`` — the
    caller applies the optimizer only when ``grads_finite`` (see
    :func:`apply_if_finite`); ``loss``/``grads`` are UNscaled.
    """
    def scaled(p):
        out = loss_fn(p, *args)
        loss, aux = out if has_aux else (out, None)
        return ls.scale_loss(loss, ls_state), (loss, aux)

    g, (loss, aux) = jax.grad(scaled, has_aux=True)(params)
    g = ls.unscale(g, ls_state)
    fin = all_finite(g)
    return g, loss, aux, fin, ls.adjust(ls_state, fin)


def apply_if_finite(opt, grads, opt_state, params, grads_finite):
    """Optimizer update predicated on finite grads: on overflow the
    step is a no-op (params AND opt state held) — a ``where`` select,
    so the compiled program is branch-free."""
    new_params, new_state = opt.update(grads, opt_state, params)
    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(grads_finite, n, o), new, old)
    return keep(new_params, params), keep(new_state, opt_state)
