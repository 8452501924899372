"""Reference Tensor-method parity surface.

The reference exposes a ``Tensor`` with differentiable methods that each
push a tape closure (``src/tensor.rs`` §2.2 of SURVEY.md).  In taper_tpu
the tensor IS ``jnp.ndarray`` and autodiff is tracing, so most of these are
one-liners — this module pins down the exact correspondences (and the few
semantic subtleties) so reference users can migrate mechanically, and gives
the test suite a stable surface to verify gradients against the reference's
hand formulas.

Reference → here:

==========================  =================================================
``Tensor::transpose``       :func:`transpose` (2-D; ``jnp.transpose``)
``Tensor::sigmoid``         ``ops.sigmoid``
``Tensor::add_broadcast``   :func:`add_broadcast` ([B,F]+[F])
``Tensor::sub_broadcast_rows`` :func:`sub_broadcast_rows` ([B,C]−[B,1])
``Tensor::mean``            :func:`mean`
``Tensor::reshape/view``    :func:`reshape`
``Tensor::flatten``         :func:`flatten`
``Tensor::squeeze/unsqueeze`` :func:`squeeze` / :func:`unsqueeze`
``Tensor::sum(dim,keepdim)`` :func:`sum`
``Tensor::exp/log/pow/sqrt`` :func:`exp`/:func:`log`/:func:`pow`/:func:`sqrt`
``Tensor::max/argmax``      :func:`max` / :func:`argmax` (non-differentiable
                            in the reference; here ``max`` IS differentiable
                            — a strict improvement, noted for parity tests)
``slice_channels`` etc.     :func:`slice_channels`, :func:`slice_output_channels`,
(``src/nn.rs:860-1016``)    :func:`slice_1d`, :func:`cat` — all differentiable
                            here (non-differentiable in the reference)
==========================  =================================================
"""

from __future__ import annotations

import jax.numpy as jnp


def transpose(x):
    """2-D transpose (reference blocked transpose, ``tensor.rs:544-591``)."""
    assert x.ndim == 2, x.shape
    return x.T


def add_broadcast(x, b):
    """[B, F] + [F] row broadcast (``tensor.rs:636-704``)."""
    return x + b


def sub_broadcast_rows(x, r):
    """[B, C] − [B, 1] column broadcast (``tensor.rs:707-770``)."""
    return x - r


def mean(x):
    return jnp.mean(x)


def reshape(x, shape):
    return x.reshape(shape)


def flatten(x, start_dim: int = 1):
    lead = x.shape[:start_dim]
    return x.reshape(*lead, -1)


def squeeze(x, axis=None):
    return jnp.squeeze(x, axis)


def unsqueeze(x, axis: int):
    return jnp.expand_dims(x, axis)


def sum(x, dim=None, keepdim: bool = False):  # noqa: A001 - parity name
    return jnp.sum(x, axis=dim, keepdims=keepdim)


def exp(x):
    return jnp.exp(x)


def log(x):
    return jnp.log(x)


def pow(x, p):  # noqa: A001 - parity name
    return x ** p


def sqrt(x):
    return jnp.sqrt(x)


def max(x, dim=None, keepdim: bool = False):  # noqa: A001 - parity name
    return jnp.max(x, axis=dim, keepdims=keepdim)


def argmax(x, dim=None):
    return jnp.argmax(x, axis=dim)


# -- channel slicing / concatenation (reference src/nn.rs:860-1016) ---------

def slice_channels(x, start: int, end: int):
    """NCHW input-channel slice."""
    return x[:, start:end]


def slice_output_channels(w, start: int, end: int):
    """OIHW output-channel slice."""
    return w[start:end]


def slice_1d(x, start: int, end: int):
    return x[start:end]


def cat(tensors, axis: int = 1):
    return jnp.concatenate(tensors, axis=axis)


# -- operator parity (reference src/ops.rs Add/Mul/Sub/Div overloads) --------

def add(a, b):
    return a + b


def mul(a, b):
    return a * b


def sub(a, b):
    """grad: (+g, −g) — reference ``src/ops.rs:377-416``."""
    return a - b


def div(a, b):
    """grad: (g/b, −g·a/b²) — reference ``src/ops.rs:440-496``."""
    return a / b
