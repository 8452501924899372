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
