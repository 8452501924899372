"""Losses and classification metrics (reference ``src/loss.rs``).

Parity surface:

* ``bce_loss``                — ``src/loss.rs:6-73`` (eps clamp 1e-7)
* ``mse_loss``                — ``src/loss.rs:76-80``
* ``softmax``                 — ``src/loss.rs:82-98`` (max-shifted)
* ``log_softmax``             — ``src/loss.rs:101-126`` (last dim)
* ``cross_entropy_loss``      — ``src/loss.rs:136-195`` (index targets)
* ``cross_entropy_loss_onehot`` — ``src/loss.rs:202-245``
* ``one_hot``                 — ``src/loss.rs:248-268``
* ``accuracy``                — ``src/loss.rs:271-290``

Gradients fall out of JAX tracing; the reference's hand-written CE backward
``(softmax − onehot)/B`` (``src/loss.rs:174-191``) is exactly what autodiff
derives for this forward, which the gradient-parity tests verify.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7  # reference's BCE clamp (src/loss.rs:23)


def bce_loss(preds, targets):
    """Mean binary cross-entropy with predictions clamped to [eps, 1-eps]."""
    p = jnp.clip(preds, _EPS, 1.0 - _EPS)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def mse_loss(preds, targets):
    return jnp.mean((preds - targets) ** 2)


def softmax(x, axis: int = -1):
    """Max-shifted softmax (numerically stable, like the reference)."""
    shifted = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    e = jnp.exp(shifted)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def log_softmax(x, axis: int = -1):
    shifted = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=axis,
                                     keepdims=True))


def one_hot(labels, num_classes: int):
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes,
                          dtype=jnp.float32)


def cross_entropy_loss(logits, targets):
    """Mean NLL with integer class targets ``[B]`` (or ``[B,1]``)."""
    targets = targets.reshape(-1).astype(jnp.int32)
    logp = log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)
    return jnp.mean(nll)


def cross_entropy_loss_onehot(logits, onehot_targets):
    logp = log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot_targets * logp, axis=-1))


def accuracy(logits, targets):
    """Fraction of argmax predictions equal to integer labels."""
    preds = jnp.argmax(logits, axis=-1)
    return jnp.mean((preds == targets.reshape(-1).astype(preds.dtype))
                    .astype(jnp.float32))


def cross_entropy_loss_smoothed(logits, targets, smoothing: float = 0.1):
    """Label-smoothed CE: the target distribution puts ``1 − smoothing``
    on the true class and spreads ``smoothing`` uniformly.  Reduces to
    :func:`cross_entropy_loss` at ``smoothing = 0``."""
    targets = targets.reshape(-1).astype(jnp.int32)
    logp = log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    uniform = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * uniform)


# ---------------------------------------------------------------------------
# Fused linear + cross-entropy: the large-vocab memory optimization.
# ---------------------------------------------------------------------------

import functools as _functools


def _pad_head(head, chunk):
    """Pad ``head [V, D]`` rows up to a multiple of ``chunk``; padded rows
    are masked to −inf logits inside the scans."""
    v = head.shape[0]
    n_chunks = -(-v // chunk)
    pad = n_chunks * chunk - v
    if pad:
        head = jnp.concatenate(
            [head, jnp.zeros((pad, head.shape[1]), head.dtype)], axis=0)
    return head.reshape(n_chunks, chunk, head.shape[1]), v


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_linear_ce(chunk, x, head, targets):
    nll, pred, lse = _fused_fwd_scan(chunk, x, head, targets)
    return nll, pred, lse


def _fused_fwd_scan(chunk, x, head, targets):
    """Online softmax over vocab chunks: returns per-token ``nll``,
    ``pred`` (argmax class) and ``lse`` without a ``[N, V]`` buffer."""
    n = x.shape[0]
    hc, v = _pad_head(head, chunk)
    cols = jnp.arange(chunk)

    def step(carry, inp):
        m, s, tl, best, besti = carry
        h_c, c0 = inp
        logits = (x @ h_c.T).astype(jnp.float32)           # [N, chunk]
        valid = (c0 + cols) < v
        logits = jnp.where(valid[None, :], logits, -jnp.inf)
        m_c = jnp.max(logits, axis=1)
        m_new = jnp.maximum(m, m_c)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        s = s * jnp.exp(m - m_safe) + jnp.sum(
            jnp.exp(logits - m_safe[:, None]), axis=1)
        j = targets - c0
        in_chunk = (j >= 0) & (j < chunk)
        lt = jnp.take_along_axis(
            logits, jnp.clip(j, 0, chunk - 1)[:, None], axis=1)[:, 0]
        tl = jnp.where(in_chunk, lt, tl)
        b_c = jnp.argmax(logits, axis=1) + c0
        better = m_c > best
        best = jnp.where(better, m_c, best)
        besti = jnp.where(better, b_c, besti)
        return (m_new, s, tl, best, besti), None

    init = (jnp.full((n,), -jnp.inf), jnp.zeros((n,)),
            jnp.zeros((n,)), jnp.full((n,), -jnp.inf),
            jnp.zeros((n,), jnp.int32))
    c0s = jnp.arange(hc.shape[0]) * chunk
    (m, s, tl, _, pred), _ = jax.lax.scan(step, init, (hc, c0s))
    lse = m + jnp.log(s)
    return lse - tl, pred, lse


def _fused_fwd(chunk, x, head, targets):
    nll, pred, lse = _fused_fwd_scan(chunk, x, head, targets)
    return (nll, pred, lse), (x, head, targets, lse)


def _fused_bwd(chunk, res, cts):
    x, head, targets, lse = res
    g = cts[0].astype(jnp.float32)            # d/d nll; pred ct is float0
    # d/d lse (z-loss etc.): d lse / d logits = softmax p, so it simply
    # adds to p's coefficient in the shared chunk recompute below
    gl = cts[2].astype(jnp.float32)
    hc, v = _pad_head(head, chunk)
    cols = jnp.arange(chunk)
    xf = x.astype(jnp.float32)

    def step(dx, inp):
        h_c, c0 = inp
        # recompute logits EXACTLY as the forward did (input-dtype
        # matmul, then the f32 cast): the saved lse came from that
        # computation, so a full-f32 recompute would make
        # p = exp(logits − lse) inconsistent by the bf16 rounding of
        # the dominant logit and per-row p would no longer sum to 1
        logits = (x @ h_c.T).astype(jnp.float32)
        valid = (c0 + cols) < v
        p = jnp.where(valid[None, :],
                      jnp.exp(logits - lse[:, None]), 0.0)
        onehot = ((targets[:, None] - c0) == cols[None, :]) \
            .astype(jnp.float32)
        gd = (g + gl)[:, None] * p - g[:, None] * onehot  # [N, chunk]
        dx = dx + gd @ h_c.astype(jnp.float32)
        dh_c = gd.T @ xf                                  # [chunk, D]
        return dx, dh_c

    c0s = jnp.arange(hc.shape[0]) * chunk
    dx, dh = jax.lax.scan(step, jnp.zeros_like(xf), (hc, c0s))
    dh = dh.reshape(-1, head.shape[1])[:head.shape[0]]
    return dx.astype(x.dtype), dh.astype(head.dtype), None


_fused_linear_ce.defvjp(_fused_fwd, _fused_bwd)


def fused_linear_cross_entropy(x, head, targets, chunk: int = 4096,
                               return_lse: bool = False):
    """Per-token NLL of ``logits = x @ headᵀ`` WITHOUT materializing the
    ``[N, V]`` logits — the large-vocab head optimization (beyond the
    reference, which has no LM head at all).

    ``x [N, D]``, ``head [V, D]`` (TinyGPT's layout), ``targets [N]``
    int.  Both passes stream vocab chunks of ``chunk`` rows: the forward
    keeps an online max/logsumexp plus the target logit (O(N) state);
    the custom backward recomputes each chunk's logits from the saved
    ``lse`` and accumulates ``dx`` / ``dhead`` chunkwise, so peak
    activation memory is O(N·chunk) instead of O(N·V).

    Cost model (measured, ``benchmarks/probe_fused_ce.py``, v5e): the
    fused path runs 4 ``N·V·D`` matmuls (fwd logits + bwd recompute +
    dx + dhead) vs the naive 3, and measures 1.2–1.4× slower where the
    naive path FITS (N=4096, D=1024, V≤32K).  The point is memory: at
    V=131072 the naive backward's ~3 transient ``N·V`` f32 buffers are
    ~6 GB and OOM-prone, while the fused path streams in O(N·chunk) —
    this is a memory-headroom feature (big-vocab training), not a
    speed-up at small V.

    Returns ``(nll [N], pred [N])`` — ``pred`` is the online argmax
    (not differentiable).  ``return_lse=True`` adds the per-token
    ``logsumexp(logits)`` as a third output — DIFFERENTIABLE through the
    same chunked backward (its cotangent adds ``softmax`` to the chunk
    recompute), which is what z-loss regularization needs.
    """
    targets = targets.reshape(-1).astype(jnp.int32)
    nll, pred, lse = _fused_linear_ce(int(chunk), x, head, targets)
    return (nll, pred, lse) if return_lse else (nll, pred)
