"""Optimizers and LR schedulers (reference ``src/optim.rs``, rebuilt functional).

Each optimizer is a pure ``(init, update)`` pair: ``init(params) -> state``,
``update(grads, state, params) -> (new_params, new_state)``.  Both are
jit-compatible, so the whole train step (forward + backward + update)
compiles to a single XLA program — the design that replaces the reference's
eager per-element update loops (``src/optim.rs:83-113``).

Two update paths:

* tree-wise ``jnp`` math (default) — XLA fuses each leaf's m/v/p update
  into one streaming pass; measured at HBM roofline on v5e, so this IS the
  fused optimizer on TPU.
* flat-vector Pallas kernel (``TAPER_FUSED_OPT=1`` + pallas backend) — the
  whole pytree raveled into one vector and updated by ONE kernel
  (``ops/pallas/optim_kernels.py``), the literal analogue of the
  reference's single update loop; kept for study (the ravel/unravel copies
  make it slower than the tree path — see ``_use_fused``).

The learning rate and step count live in the optimizer *state* as arrays, so
schedulers can change them every epoch without triggering recompilation
(the reference mutates ``self.lr`` via ``set_lr``, ``src/optim.rs:121-127``).

Parity inventory:

* ``SGD``       — ``src/optim.rs:8-40`` (the reference's momentum TODO at
  ``:15`` is implemented here)
* ``Adam``      — ``src/optim.rs:43-128`` (L2-style decay added to grads,
  bias-corrected step size)
* ``AdamW``     — ``src/optim.rs:131-181`` (decoupled decay)
* ``StepLR`` / ``ExponentialLR`` / ``CosineAnnealingLR`` /
  ``ReduceLROnPlateau`` — ``src/optim.rs:190-352``
* ``Adafactor`` — beyond-reference: factored second moments for
  large-model training (see its docstring)
* ``Lion`` — beyond-reference: sign-of-momentum (arXiv:2302.06675),
  one moment, bf16-robust
* ``Muon`` — beyond-reference: Newton-Schulz orthogonalized momentum
  for matrices (matmul-only inner loop — MXU work), Adam fallback

Non-trainable leaves (names starting with ``running_``, e.g. BatchNorm
statistics) are masked out of every update.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from taper_tpu.ops import backend as _backend

Params = Any
State = Dict[str, Any]


_FROZEN_PREFIXES = ("running_", "fq_")


def _leaf_key(entry) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _trainable_mask(params):
    """1.0 for trainable leaves, 0.0 for non-trainable state: running
    statistics (BatchNorm) and fake-quant calibration (``fq_*``)."""

    def rule(path, leaf):
        frozen = any(_leaf_key(p).startswith(_FROZEN_PREFIXES)
                     for p in path)
        return jnp.zeros_like(leaf) if frozen else jnp.ones_like(leaf)

    return jax.tree_util.tree_map_with_path(rule, params)


def _has_frozen(params) -> bool:
    """Static (host-side) check whether any leaf path is non-trainable —
    lets the fused kernels compile the faster maskless variant."""
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    return any(any(_leaf_key(p).startswith(_FROZEN_PREFIXES) for p in path)
               for path, _ in paths)


class Optimizer:
    """Base: functional optimizer with dynamic lr/step in state."""

    def __init__(self, lr: float, weight_decay: float = 0.0):
        self.lr = float(lr)
        self.weight_decay = float(weight_decay)

    def init(self, params) -> State:
        raise NotImplementedError

    def update(self, grads, state: State, params) -> Tuple[Params, State]:
        raise NotImplementedError

    # lr plumbing (used by schedulers / Trainer)
    @staticmethod
    def get_lr(state: State) -> float:
        return float(state["lr"])

    @staticmethod
    def set_lr(state: State, lr: float) -> State:
        return {**state, "lr": jnp.asarray(lr, jnp.float32)}

    # Measured dispatch (v5e, 25M params, benchmarks/tune_all.py adam):
    # the flat-vector Pallas kernel itself streams at roofline, but the
    # ravel/pad/unravel copies around it triple the HBM traffic (~2.1GB vs
    # 700MB), landing at ~212 GB/s-of-useful-bytes; XLA's per-leaf fused
    # tree update needs no copies and reaches ~800+ (≈ HBM roofline on the
    # real 700MB).  The tree path is therefore the default at every size;
    # set TAPER_FUSED_OPT=1 to force the flat Pallas formulation (kept for
    # study/bench parity with the reference's single-loop updates).
    FORCE_FUSED = False  # programmatic hook; the env var is read per call
    # (like TAPER_CONV/TAPER_POOL) so setting it after import works.

    def _use_fused(self, params=None) -> bool:
        force = (self.FORCE_FUSED
                 or os.environ.get("TAPER_FUSED_OPT", "0") == "1")
        return force and _backend.get_backend() == "pallas"


class SGD(Optimizer):
    """SGD with optional momentum and L2 weight decay."""

    def __init__(self, lr: float, momentum: float = 0.0,
                 weight_decay: float = 0.0):
        super().__init__(lr, weight_decay)
        self.momentum = float(momentum)

    def init(self, params) -> State:
        state: State = {"lr": jnp.asarray(self.lr, jnp.float32)}
        if self._use_fused(params):
            # Fused-kernel representation: momentum + mask live as flat
            # vectors so the per-step kernel never re-concatenates them
            # (only params/grads are raveled each step).  All-trainable
            # trees skip the mask entirely (maskless kernel, ~2.6x faster).
            p_flat, _ = ravel_pytree(params)
            state["m_flat"] = jnp.zeros_like(p_flat)
            if _has_frozen(params):
                state["mask_flat"], _ = ravel_pytree(
                    _trainable_mask(params))
        else:
            state["mask"] = _trainable_mask(params)
            state["m"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(self, grads, state, params):
        lr = state["lr"]
        if "m_flat" in state:
            from taper_tpu.ops.pallas import optim_kernels as ok
            p_flat, unravel = ravel_pytree(params)
            g_flat, _ = ravel_pytree(grads)
            p_new, m_new = ok.sgd_update_flat(
                p_flat, g_flat, state["m_flat"],
                state.get("mask_flat"), lr,
                momentum=self.momentum, wd=self.weight_decay)
            return unravel(p_new), {**state, "m_flat": m_new}

        def upd(p, g, m, k):
            if self.weight_decay != 0.0:
                g = g + self.weight_decay * p
            if self.momentum != 0.0:
                m = self.momentum * m + g
                step = m
            else:
                step = g
            return jnp.where(k > 0, p - lr * step, p), m

        flat = jax.tree.map(upd, params, grads, state["m"], state["mask"])
        new_params = jax.tree.map(lambda t: t[0], flat,
                                  is_leaf=lambda t: isinstance(t, tuple))
        new_m = jax.tree.map(lambda t: t[1], flat,
                             is_leaf=lambda t: isinstance(t, tuple))
        return new_params, {**state, "m": new_m}

    def zero_grad(self, grads):
        """Parity shim — functional grads need no zeroing; returns zeros."""
        return jax.tree.map(jnp.zeros_like, grads)


class Adam(Optimizer):
    """Adam with L2-style weight decay folded into the gradient."""

    decoupled = False

    def __init__(self, lr: float = 1e-3, betas=(0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.0):
        super().__init__(lr, weight_decay)
        self.b1, self.b2 = float(betas[0]), float(betas[1])
        self.eps = float(eps)

    def init(self, params) -> State:
        state: State = {
            "lr": jnp.asarray(self.lr, jnp.float32),
            "step": jnp.asarray(0, jnp.int32),
        }
        if self._use_fused(params):
            p_flat, _ = ravel_pytree(params)
            state["m_flat"] = jnp.zeros_like(p_flat)
            state["v_flat"] = jnp.zeros_like(p_flat)
            if _has_frozen(params):
                state["mask_flat"], _ = ravel_pytree(
                    _trainable_mask(params))
        else:
            state["m"] = jax.tree.map(jnp.zeros_like, params)
            state["v"] = jax.tree.map(jnp.zeros_like, params)
            state["mask"] = _trainable_mask(params)
        return state

    def update(self, grads, state, params):
        lr = state["lr"]
        t = state["step"] + 1
        tf = t.astype(jnp.float32)

        if "m_flat" in state:
            from taper_tpu.ops.pallas import optim_kernels as ok
            p_flat, unravel = ravel_pytree(params)
            g_flat, _ = ravel_pytree(grads)
            p_new, m_new, v_new = ok.adam_update_flat(
                p_flat, g_flat, state["m_flat"], state["v_flat"],
                state.get("mask_flat"), lr, tf,
                b1=self.b1, b2=self.b2, eps=self.eps,
                wd=self.weight_decay, decoupled=self.decoupled)
            return unravel(p_new), {**state, "step": t,
                                    "m_flat": m_new,
                                    "v_flat": v_new}

        # Bias-corrected step size precomputed once per step, exactly the
        # reference's formulation (src/optim.rs:88-90).
        step_size = lr * jnp.sqrt(1.0 - self.b2 ** tf) / (1.0 - self.b1 ** tf)

        def upd(p, g, m, v, k):
            if self.weight_decay != 0.0 and not self.decoupled:
                g = g + self.weight_decay * p
            m = self.b1 * m + (1.0 - self.b1) * g
            v = self.b2 * v + (1.0 - self.b2) * g * g
            p_out = p
            if self.weight_decay != 0.0 and self.decoupled:
                p_out = p_out * (1.0 - lr * self.weight_decay)
            p_out = p_out - step_size * m / (jnp.sqrt(v) + self.eps)
            return jnp.where(k > 0, p_out, p), m, v

        flat = jax.tree.map(upd, params, grads, state["m"], state["v"],
                            state["mask"])
        pick = lambda i: jax.tree.map(
            lambda tup: tup[i], flat,
            is_leaf=lambda tup: isinstance(tup, tuple))
        return pick(0), {**state, "step": t, "m": pick(1), "v": pick(2)}

    def zero_grad(self, grads):
        return jax.tree.map(jnp.zeros_like, grads)


class AdamW(Adam):
    """Adam with decoupled weight decay (reference ``src/optim.rs:131-181``)."""

    decoupled = True


class Adafactor(Optimizer):
    """Memory-efficient adaptive optimizer (Shazeer & Stern 2018) —
    the TPU-era standard for large models (beyond-reference scope; the
    reference stops at Adam/AdamW, ``src/optim.rs``).

    Second-moment accumulators of rank-≥2 leaves are stored FACTORED
    over the last two axes — a row vector + a column vector, O(r+c)
    instead of O(r·c) — which cuts optimizer HBM by ~2× vs Adam (no
    full ``v``, and no ``m`` by default).  Vectors/scalars keep a full
    second moment.  Implements the paper's recommended recipe:

    * β2 schedule ``1 − t^(−decay)`` (default decay 0.8),
    * update clipping to RMS ≤ ``clip_threshold`` (d = 1.0),
    * relative step size ``α_t = max(eps2, RMS(p)) · ρ_t`` with
      ``ρ_t = min(lr, 1/√t)`` when ``relative_step=True`` (default;
      ``lr`` then acts as the ρ ceiling — schedulers still work through
      ``set_lr``), plain ``lr`` otherwise,
    * optional first moment (``beta1 > 0``; off by default — that is
      where the memory saving comes from), decoupled weight decay.
    """

    def __init__(self, lr: float = 1e-2, beta1: float = 0.0,
                 decay: float = 0.8, eps1: float = 1e-30,
                 eps2: float = 1e-3, clip_threshold: float = 1.0,
                 weight_decay: float = 0.0, relative_step: bool = True):
        super().__init__(lr, weight_decay)
        self.beta1 = float(beta1)
        self.decay = float(decay)
        self.eps1 = float(eps1)
        self.eps2 = float(eps2)
        self.d = float(clip_threshold)
        self.relative_step = bool(relative_step)

    @staticmethod
    def _factored(p) -> bool:
        return p.ndim >= 2

    def init(self, params) -> State:
        def v_leaf(p):
            if self._factored(p):
                return (jnp.zeros(p.shape[:-1], jnp.float32),
                        jnp.zeros(p.shape[:-2] + p.shape[-1:],
                                  jnp.float32))
            return (jnp.zeros(p.shape, jnp.float32),)

        state: State = {
            "lr": jnp.asarray(self.lr, jnp.float32),
            "step": jnp.asarray(0, jnp.int32),
            "v": jax.tree.map(v_leaf, params),
            "mask": _trainable_mask(params),
        }
        if self.beta1 > 0.0:
            state["m"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(self, grads, state, params):
        lr = state["lr"]
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        beta2 = 1.0 - tf ** (-self.decay)
        rho = jnp.minimum(lr, 1.0 / jnp.sqrt(tf)) if self.relative_step \
            else lr

        treedef = jax.tree.structure(params)
        leaves_p = jax.tree.leaves(params)
        leaves_g = jax.tree.leaves(grads)
        leaves_v = treedef.flatten_up_to(state["v"])
        leaves_k = jax.tree.leaves(state["mask"])
        leaves_m = (jax.tree.leaves(state["m"])
                    if self.beta1 > 0.0 else [None] * len(leaves_p))

        new_p, new_v, new_m = [], [], []
        for p, g, v, k, m in zip(leaves_p, leaves_g, leaves_v, leaves_k,
                                 leaves_m):
            g = g.astype(jnp.float32)
            g2 = g * g + self.eps1
            if self._factored(p):
                vr, vc = v
                vr = beta2 * vr + (1.0 - beta2) * jnp.mean(g2, axis=-1)
                vc = beta2 * vc + (1.0 - beta2) * jnp.mean(g2, axis=-2)
                # rank-1 reconstruction: vhat = vr·vc / sum_rows(vr)
                denom = jnp.mean(vr, axis=-1, keepdims=True)[..., None]
                vhat = vr[..., :, None] * vc[..., None, :] \
                    / jnp.maximum(denom, self.eps1)
                v_out = (vr, vc)
            else:
                v_full = beta2 * v[0] + (1.0 - beta2) * g2
                vhat = v_full
                v_out = (v_full,)
            u = g * jax.lax.rsqrt(jnp.maximum(vhat, self.eps1))
            rms_u = jnp.sqrt(jnp.mean(u * u) + 1e-30)
            u = u / jnp.maximum(1.0, rms_u / self.d)
            if m is not None:
                m = self.beta1 * m + (1.0 - self.beta1) * u
                u = m
                new_m.append(jnp.where(k > 0, m, 0.0))
            if self.relative_step:
                rms_p = jnp.sqrt(jnp.mean(
                    p.astype(jnp.float32) ** 2) + 1e-30)
                alpha = jnp.maximum(self.eps2, rms_p) * rho
            else:
                alpha = rho
            p_out = p.astype(jnp.float32)
            if self.weight_decay != 0.0:
                p_out = p_out * (1.0 - alpha * self.weight_decay)
            p_out = (p_out - alpha * u).astype(p.dtype)
            new_p.append(jnp.where(k > 0, p_out, p))
            new_v.append(v_out)

        out = {**state, "step": t,
               "v": jax.tree.unflatten(treedef, new_v)}
        if self.beta1 > 0.0:
            out["m"] = jax.tree.unflatten(treedef, new_m)
        return jax.tree.unflatten(treedef, new_p), out

    def zero_grad(self, grads):
        return jax.tree.map(jnp.zeros_like, grads)


class Lion(Optimizer):
    """Lion (Chen et al. 2023, arXiv:2302.06675) — sign-of-momentum updates.

    Beyond-reference scope.  State is ONE moment (half of Adam's), and the
    update magnitude is exactly ``lr`` per element (sign), which makes it
    robust in bf16 — both properties that matter at large scale on TPU.
    Decoupled weight decay as in the paper.  Typical lr is 3-10× smaller
    than Adam's with 3-10× larger weight decay.
    """

    def __init__(self, lr: float = 1e-4, betas=(0.9, 0.99),
                 weight_decay: float = 0.0):
        super().__init__(lr, weight_decay)
        self.b1, self.b2 = float(betas[0]), float(betas[1])

    def init(self, params) -> State:
        # Moments are f32 regardless of param dtype (the update math runs
        # in f32, and a stable state dtype keeps lax.scan carries valid
        # for bf16-param models).
        return {"lr": jnp.asarray(self.lr, jnp.float32),
                "m": jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params),
                "mask": _trainable_mask(params)}

    def update(self, grads, state, params):
        lr = state["lr"]

        def upd(p, g, m, k):
            g = g.astype(jnp.float32)
            u = jnp.sign(self.b1 * m + (1.0 - self.b1) * g)
            p_out = p.astype(jnp.float32)
            if self.weight_decay != 0.0:
                p_out = p_out * (1.0 - lr * self.weight_decay)
            p_out = (p_out - lr * u).astype(p.dtype)
            m = self.b2 * m + (1.0 - self.b2) * g
            return jnp.where(k > 0, p_out, p), jnp.where(k > 0, m, 0.0)

        flat = jax.tree.map(upd, params, grads, state["m"], state["mask"])
        pick = lambda i: jax.tree.map(
            lambda tup: tup[i], flat,
            is_leaf=lambda tup: isinstance(tup, tuple))
        return pick(0), {**state, "m": pick(1)}

    def zero_grad(self, grads):
        return jax.tree.map(jnp.zeros_like, grads)


def newton_schulz_orthogonalize(x, steps: int = 5, eps: float = 1e-7):
    """Approximately project a matrix onto the nearest semi-orthogonal one.

    Quintic Newton-Schulz iteration with the tuned coefficients from Muon
    (Jordan et al. 2024): after ``steps`` iterations the singular values
    of the result lie in roughly [0.7, 1.3] (NOT exactly 1 — Muon only
    needs the spectrum flattened, not exact).  All compute is matmuls —
    this runs on the MXU, which is why Muon is a natural TPU optimizer.
    Works on ``[r, c]``; internally transposes so the Gram matrix is the
    smaller of the two (``A`` is ``min(r,c)²``).
    """
    a, b, c = 3.4445, -4.7750, 2.0315
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)
    for _ in range(steps):
        A = x @ x.T
        B = b * A + c * (A @ A)
        x = a * x + B @ x
    return x.T if transposed else x


class Muon(Optimizer):
    """Muon (Jordan et al. 2024): momentum + Newton-Schulz orthogonalized
    updates for matrix parameters; Adam for everything else.

    Beyond-reference scope.  Rank-≥2 leaves (conv kernels flattened to
    ``[Cout, rest]``) get: ``m ← μ·m + g``; the (nesterov) effective
    gradient is orthogonalized by :func:`newton_schulz_orthogonalize` and
    applied scaled by ``√(max(1, r/c))``.  The NS iteration is ~99%
    matmul FLOPs — MXU work, a few % of the step at typical shapes.
    Vector/scalar leaves and excluded paths (embeddings by default, per
    the paper's recipe) fall back to an internal Adam with its own
    ``adam_lr`` (the scheduler's ``set_lr`` scales BOTH, preserving their
    ratio).  No second moment is kept for matrix leaves.
    """

    def __init__(self, lr: float = 0.02, momentum: float = 0.95,
                 nesterov: bool = True, ns_steps: int = 5,
                 weight_decay: float = 0.0, adam_lr: float = 3e-4,
                 betas=(0.9, 0.95), eps: float = 1e-8,
                 exclude=("tok", "pos", "emb")):
        super().__init__(lr, weight_decay)
        self.momentum = float(momentum)
        self.nesterov = bool(nesterov)
        self.ns_steps = int(ns_steps)
        self.adam_lr = float(adam_lr)
        self.b1, self.b2 = float(betas[0]), float(betas[1])
        self.eps = float(eps)
        self.exclude = tuple(exclude)

    def _is_matrix(self, path, leaf) -> bool:
        if getattr(leaf, "ndim", 0) < 2:
            return False
        joined = "/".join(_leaf_key(p) for p in path).lower()
        return not any(t in joined for t in self.exclude)

    def init(self, params) -> State:
        # v exists only on the Adam-fallback leaves (scalar placeholder on
        # matrix leaves keeps the tree structure without Adam's memory).
        # All state is f32 regardless of param dtype — stable scan-carry
        # dtype for bf16-param models, full-precision accumulation.
        def v_leaf(path, p):
            return (jnp.zeros(()) if self._is_matrix(path, p)
                    else jnp.zeros(p.shape, jnp.float32))

        return {"lr": jnp.asarray(self.lr, jnp.float32),
                "step": jnp.asarray(0, jnp.int32),
                "m": jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params),
                "v": jax.tree_util.tree_map_with_path(v_leaf, params),
                "mask": _trainable_mask(params)}

    def update(self, grads, state, params):
        lr = state["lr"]
        # scheduler scales the muon lr; the adam side rides at a fixed
        # ratio so one set_lr call anneals both
        adam_lr = lr * (self.adam_lr / self.lr)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        adam_step = adam_lr * jnp.sqrt(1.0 - self.b2 ** tf) \
            / (1.0 - self.b1 ** tf)

        def upd(path, p, g, m, v, k):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if self._is_matrix(path, p):
                m = self.momentum * m + g
                u = g + self.momentum * m if self.nesterov else m
                u2 = u.reshape(u.shape[0], -1)
                o = newton_schulz_orthogonalize(u2, self.ns_steps)
                scale = math.sqrt(max(1.0, u2.shape[0] / u2.shape[1]))
                if self.weight_decay != 0.0:
                    p32 = p32 * (1.0 - lr * self.weight_decay)
                p_out = p32 - lr * scale * o.reshape(p.shape)
                # v is the scalar placeholder here — never touched (no
                # broadcast through the full-shape mask)
            else:
                m = self.b1 * m + (1.0 - self.b1) * g
                v = jnp.where(k > 0,
                              self.b2 * v + (1.0 - self.b2) * g * g, 0.0)
                if self.weight_decay != 0.0:
                    p32 = p32 * (1.0 - adam_lr * self.weight_decay)
                p_out = p32 - adam_step * m / (jnp.sqrt(v) + self.eps)
            return (jnp.where(k > 0, p_out.astype(p.dtype), p),
                    jnp.where(k > 0, m, 0.0), v)

        flat = jax.tree_util.tree_map_with_path(
            upd, params, grads, state["m"], state["v"], state["mask"])
        pick = lambda i: jax.tree.map(
            lambda tup: tup[i], flat,
            is_leaf=lambda tup: isinstance(tup, tuple))
        return pick(0), {**state, "step": t, "m": pick(1), "v": pick(2)}

    def zero_grad(self, grads):
        return jax.tree.map(jnp.zeros_like, grads)


# ---------------------------------------------------------------------------
# LR schedulers — small host-side epoch-level objects; call ``step()`` per
# epoch and push ``get_lr()`` into the optimizer state with ``set_lr``.
# ---------------------------------------------------------------------------

class LRScheduler:
    def __init__(self, initial_lr: float):
        self.initial_lr = float(initial_lr)
        self.lr = float(initial_lr)
        self.epoch = 0

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        self.lr = self._compute(metric)
        return self.lr

    def get_lr(self) -> float:
        return self.lr

    def reset(self) -> None:
        """Back to the initial schedule state (fresh training run)."""
        self.lr = self.initial_lr
        self.epoch = 0

    def _compute(self, metric) -> float:
        raise NotImplementedError


class StepLR(LRScheduler):
    """Multiply by ``gamma`` every ``step_size`` epochs."""

    def __init__(self, initial_lr: float, step_size: int, gamma: float = 0.1):
        super().__init__(initial_lr)
        self.step_size = int(step_size)
        self.gamma = float(gamma)

    def _compute(self, metric):
        return self.initial_lr * self.gamma ** (self.epoch // self.step_size)


class ExponentialLR(LRScheduler):
    def __init__(self, initial_lr: float, gamma: float):
        super().__init__(initial_lr)
        self.gamma = float(gamma)

    def _compute(self, metric):
        return self.initial_lr * self.gamma ** self.epoch


class CosineAnnealingLR(LRScheduler):
    def __init__(self, initial_lr: float, t_max: int, min_lr: float = 0.0):
        super().__init__(initial_lr)
        self.t_max = int(t_max)
        self.min_lr = float(min_lr)

    def _compute(self, metric):
        t = min(self.epoch, self.t_max)
        cos = (1.0 + math.cos(math.pi * t / self.t_max)) / 2.0
        return self.min_lr + (self.initial_lr - self.min_lr) * cos


class ReduceLROnPlateau(LRScheduler):
    """Cut lr by ``factor`` after ``patience`` epochs without improvement."""

    def __init__(self, initial_lr: float, mode: str = "min",
                 factor: float = 0.1, patience: int = 10,
                 min_lr: float = 0.0, threshold: float = 1e-4):
        super().__init__(initial_lr)
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def reset(self) -> None:
        super().reset()
        self.best = None
        self.bad_epochs = 0

    def _compute(self, metric):
        if metric is None:
            return self.lr
        improved = (self.best is None
                    or (self.mode == "min"
                        and metric < self.best - self.threshold)
                    or (self.mode == "max"
                        and metric > self.best + self.threshold))
        if improved:
            self.best = float(metric)
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.bad_epochs = 0
                return max(self.lr * self.factor, self.min_lr)
        return self.lr


class WarmupCosineLR(LRScheduler):
    """Linear warmup to ``initial_lr`` over ``warmup`` steps, then cosine
    decay to ``min_lr`` over the remaining ``t_max − warmup`` — the
    standard transformer schedule (absent in the reference, whose four
    schedulers are epoch-decay shapes; ``src/optim.rs:184-352``)."""

    def __init__(self, initial_lr: float, t_max: int, warmup: int,
                 min_lr: float = 0.0):
        super().__init__(initial_lr)
        assert 0 <= warmup < t_max, (warmup, t_max)
        self.t_max = int(t_max)
        self.warmup = int(warmup)
        self.min_lr = float(min_lr)

    def _compute(self, metric):
        # step() increments epoch before computing: epoch is 1-based here
        t = self.epoch
        if self.warmup and t <= self.warmup:
            return self.initial_lr * t / self.warmup
        t = min(t - self.warmup, self.t_max - self.warmup)
        cos = (1.0 + math.cos(
            math.pi * t / max(self.t_max - self.warmup, 1))) / 2.0
        return self.min_lr + (self.initial_lr - self.min_lr) * cos

    def schedule_array(self):
        """Per-step lr as a jnp array — precompute for scanned training
        loops (the fused-fit pattern).  Entry k is the lr after step
        k+1, matching ``step()``'s sequence."""
        saved = self.epoch
        try:
            out = []
            for t in range(1, self.t_max + 1):
                self.epoch = t
                out.append(self._compute(None))
            return jnp.asarray(out, jnp.float32)
        finally:
            self.epoch = saved


def clip_grad_norm(grads, max_norm: float):
    """Scale the gradient pytree so its global L2 norm is ≤ ``max_norm``.

    Returns ``(clipped_grads, global_norm)``; jit-safe (no data-dependent
    control flow).  The reference has no clipping anywhere.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda l: (l * scale).astype(l.dtype),
                        grads), norm


def accumulate_gradients(loss_fn, params, batches, *, has_aux=False):
    """Gradient accumulation: mean of per-microbatch gradients, computed
    inside one scanned program (peak memory = one microbatch's
    activations instead of the full batch's).

    ``loss_fn(params, batch) -> loss`` (or ``(loss, aux)`` with
    ``has_aux``); ``batches`` is a pytree whose leaves carry a leading
    microbatch axis.  Returns ``(mean_loss, mean_grads)`` (plus stacked
    aux when ``has_aux``).  The reference accumulates nothing — its
    batches are whatever fits.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)
    n = jax.tree_util.tree_leaves(batches)[0].shape[0]

    def step(carry, batch):
        loss_sum, grad_sum = carry
        if has_aux:
            (loss, aux), g = grad_fn(params, batch)
        else:
            loss, g = grad_fn(params, batch)
            aux = None
        grad_sum = jax.tree.map(jnp.add, grad_sum, g)
        return (loss_sum + loss, grad_sum), aux

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         params)
    (loss_sum, grad_sum), auxs = jax.lax.scan(
        step, (jnp.zeros((), jnp.float32), zeros), batches)
    mean_grads = jax.tree.map(
        lambda g, p: (g / n).astype(p.dtype), grad_sum, params)
    if has_aux:
        return loss_sum / n, mean_grads, auxs
    return loss_sum / n, mean_grads


class EMA:
    """Exponential moving average of a parameter pytree (evaluation /
    serving weights): ``shadow = decay·shadow + (1−decay)·params``.

    The shadow lives in f32 regardless of the parameter dtype — with
    bf16 params and decay ≥ ~0.99, ``(1−decay)·p`` is below bf16
    resolution and a bf16 shadow would never move.  Cast with
    :meth:`as_params` when evaluating."""

    def __init__(self, decay: float = 0.999):
        assert 0.0 < decay < 1.0
        self.decay = float(decay)

    def init(self, params):
        return jax.tree.map(lambda p: jnp.asarray(p, jnp.float32),
                            params)

    def update(self, shadow, params):
        d = self.decay
        return jax.tree.map(
            lambda s, p: d * s + (1.0 - d) * p.astype(jnp.float32),
            shadow, params)

    @staticmethod
    def as_params(shadow, like):
        """Shadow cast back to the dtypes of ``like``."""
        return jax.tree.map(lambda s, p: s.astype(p.dtype), shadow, like)
