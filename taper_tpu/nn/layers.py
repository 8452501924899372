"""Core NN layers (the reference's ``src/nn.rs`` inventory, rebuilt functional).

Layer set for parity (reference file:line cited per class):

* ``Linear``            — ``src/nn.rs:27-79``
* ``Conv2d``            — ``src/nn.rs:180-355`` (incl. grouped conv)
* ``Conv2dReLU``        — ``src/nn.rs:432-504`` (fused epilogue)
* ``MaxPool2d``         — ``src/nn.rs:507-566``
* ``AvgPool2d``         — ``src/nn.rs:569-651`` (incl. ``global()``)
* ``AdaptiveAvgPool2d`` — ``src/nn.rs:654-726``
* ``Flatten``           — ``src/nn.rs:729-771``
* ``Dropout``           — ``src/nn.rs:774-827``
* ``BasicBlock``        — ``src/nn.rs:830-857`` (conv3x3 + ReLU residual-style
  block; here with an actual residual add + optional BatchNorm, fixing the
  reference's TODO)
* ``BatchNorm2d``       — absent in the reference (explicit TODO at
  ``src/nn.rs:846``); provided here because real CNN work needs it.

Initialization follows the reference's schemes: He-uniform with bound
``sqrt(2/fan_in)`` for Linear (``src/nn.rs:34-50``) and Kaiming-uniform with
bound ``sqrt(2/fan_in)*sqrt(3)`` for Conv2d (``src/nn.rs:219-231``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from taper_tpu import ops
from taper_tpu.nn.module import Module

IntPair = Union[int, Sequence[int]]


def _pair(v: IntPair):
    return (v, v) if isinstance(v, int) else tuple(v)


class Linear(Module):
    """``y = x @ W.T + b`` with ``W: [out_features, in_features]``."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 activation: Optional[str] = None):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.activation = activation  # None | 'relu' | 'sigmoid' (fused)

    def init(self, key):
        bound = jnp.sqrt(2.0 / self.in_features)
        w = jax.random.uniform(
            key, (self.out_features, self.in_features),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        p = {"w": w}
        if self.use_bias:
            p["b"] = jnp.zeros((self.out_features,), jnp.float32)
        return p

    def apply(self, params, x, *, train=False, rng=None):
        return ops.linear(x, params["w"], params.get("b"),
                          activation=self.activation)


class ReLU(Module):
    def apply(self, params, x, *, train=False, rng=None):
        return ops.relu(x)


class Sigmoid(Module):
    def apply(self, params, x, *, train=False, rng=None):
        return ops.sigmoid(x)


class Conv2d(Module):
    """NCHW conv, weight ``[out, in/groups, kh, kw]`` (OIHW)."""

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: IntPair, stride: IntPair = 1,
                 padding: IntPair = 0, groups: int = 1, bias: bool = True,
                 activation: Optional[str] = None):
        assert in_channels % groups == 0 and out_channels % groups == 0
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.groups = groups
        self.use_bias = bias
        self.activation = activation

    def init(self, key):
        kh, kw = self.kernel_size
        fan_in = (self.in_channels // self.groups) * kh * kw
        bound = jnp.sqrt(2.0 / fan_in) * jnp.sqrt(3.0)
        w = jax.random.uniform(
            key, (self.out_channels, self.in_channels // self.groups, kh, kw),
            minval=-bound, maxval=bound, dtype=jnp.float32)
        p = {"w": w}
        if self.use_bias:
            p["b"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(self, params, x, *, train=False, rng=None):
        return ops.conv2d(x, params["w"], params.get("b"),
                          stride=self.stride, padding=self.padding,
                          groups=self.groups, activation=self.activation)


def conv3x3(in_ch: int, out_ch: int, stride: IntPair = 1, **kw) -> Conv2d:
    """3×3 same-padding conv (reference helper ``src/nn.rs:250-262``)."""
    return Conv2d(in_ch, out_ch, 3, stride=stride, padding=1, **kw)


def conv1x1(in_ch: int, out_ch: int, stride: IntPair = 1, **kw) -> Conv2d:
    """1×1 conv (reference helper ``src/nn.rs:264-275``)."""
    return Conv2d(in_ch, out_ch, 1, stride=stride, padding=0, **kw)


class Conv2dReLU(Conv2d):
    """Conv with a fused bias+ReLU epilogue (single Pallas kernel on TPU)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, groups=1, bias=True):
        super().__init__(in_channels, out_channels, kernel_size, stride,
                         padding, groups, bias, activation="relu")


class MaxPool2d(Module):
    def __init__(self, kernel_size: IntPair, stride: Optional[IntPair] = None,
                 padding: IntPair = 0):
        self.kernel_size = _pair(kernel_size)
        self.stride = self.kernel_size if stride is None else _pair(stride)
        self.padding = _pair(padding)

    @classmethod
    def new_2x2(cls):
        return cls(2, 2)

    def apply(self, params, x, *, train=False, rng=None):
        return ops.max_pool2d(x, kernel=self.kernel_size, stride=self.stride,
                              padding=self.padding)


class AvgPool2d(Module):
    """Average pool; kernel ``(0, 0)`` means pool over the full H×W plane
    (the reference's ``global()`` sentinel, ``src/nn.rs:586-597``)."""

    def __init__(self, kernel_size: IntPair, stride: Optional[IntPair] = None,
                 padding: IntPair = 0):
        self.kernel_size = _pair(kernel_size)
        self.stride = self.kernel_size if stride is None else _pair(stride)
        self.padding = _pair(padding)

    @classmethod
    def global_(cls):
        return cls((0, 0))

    def apply(self, params, x, *, train=False, rng=None):
        kernel = self.kernel_size
        stride = self.stride
        if kernel == (0, 0):  # global pooling sentinel
            kernel = (x.shape[2], x.shape[3])
            stride = kernel
        return ops.avg_pool2d(x, kernel=kernel, stride=stride,
                              padding=self.padding)


class AdaptiveAvgPool2d(Module):
    """Pools to a fixed output size: kernel = stride = floor(in/out)
    (reference ``src/nn.rs:654-726``)."""

    def __init__(self, output_size: IntPair):
        self.output_size = _pair(output_size)

    @classmethod
    def global_(cls):
        return cls((1, 1))

    def apply(self, params, x, *, train=False, rng=None):
        oh, ow = self.output_size
        h, w = x.shape[2], x.shape[3]
        kh, kw = h // oh, w // ow
        return ops.avg_pool2d(x, kernel=(kh, kw), stride=(kh, kw))


class Flatten(Module):
    def __init__(self, start_dim: int = 1):
        self.start_dim = start_dim

    def apply(self, params, x, *, train=False, rng=None):
        lead = x.shape[: self.start_dim]
        return x.reshape(*lead, -1)


class Dropout(Module):
    """Inverted dropout (train-only; reference ``src/nn.rs:774-827``).

    Needs an explicit ``rng`` when ``train=True`` — JAX's functional RNG
    replaces the reference's ambient ``thread_rng``.
    """

    def __init__(self, p: float = 0.5):
        assert 0.0 <= p < 1.0
        self.p = p

    def apply(self, params, x, *, train=False, rng=None):
        if not train or self.p == 0.0:
            return x
        if rng is None:
            raise ValueError("Dropout.apply(train=True) requires rng=")
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class BatchNorm2d(Module):
    """Batch norm over NCHW; running stats carried inside params.

    The running mean/var are non-trainable state — optimizers in this
    library skip leaves whose path starts with ``'running_'`` (see
    ``optim.py``).  Training loops use :meth:`apply_train`, which both
    normalizes with batch statistics and returns params with updated
    running stats (the Trainer threads these automatically); eval-mode
    :meth:`apply` normalizes with the stored running stats.  The reference
    has no BatchNorm at all (TODO at ``src/nn.rs:846``).
    """

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, key):
        f = self.num_features
        return {
            "scale": jnp.ones((f,), jnp.float32),
            "bias": jnp.zeros((f,), jnp.float32),
            "running_mean": jnp.zeros((f,), jnp.float32),
            "running_var": jnp.ones((f,), jnp.float32),
        }

    def _normalize(self, x, mean, var, scale, bias):
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x - mean.reshape(1, -1, 1, 1)) * inv.reshape(1, -1, 1, 1)
        return out * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)

    def apply(self, params, x, *, train=False, rng=None):
        if train:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
        else:
            mean = params["running_mean"]
            var = params["running_var"]
        return self._normalize(x, mean, var, params["scale"], params["bias"])

    @staticmethod
    def _unbias(var, x):
        """Bessel-correct the batch variance for the running-stat EMA
        (normalization itself uses the biased batch variance — the
        standard BatchNorm convention)."""
        n = x.shape[0] * x.shape[2] * x.shape[3]
        return var * (n / max(n - 1, 1))

    def apply_train(self, params, x, *, rng=None):
        """Normalize with batch stats AND return updated running stats
        (stop-gradiented: the EMA update is state, not a loss path)."""
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        y = self._normalize(x, mean, var, params["scale"], params["bias"])
        m = self.momentum
        uvar = self._unbias(var, x)
        new_params = {
            **params,
            "running_mean": jax.lax.stop_gradient(
                (1 - m) * params["running_mean"] + m * mean),
            "running_var": jax.lax.stop_gradient(
                (1 - m) * params["running_var"] + m * uvar),
        }
        return y, new_params

    def updated_stats(self, params, x):
        """New running stats after observing batch ``x`` (train mode)."""
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        m = self.momentum
        return {
            **params,
            "running_mean": (1 - m) * params["running_mean"] + m * mean,
            "running_var": ((1 - m) * params["running_var"]
                            + m * self._unbias(var, x)),
        }


class BasicBlock(Module):
    """conv3x3 (→ BN) → ReLU (→ conv3x3 (→ BN)) with optional residual add.

    The reference's ``BasicBlock`` (``src/nn.rs:830-857``) is conv3x3+ReLU
    with a BatchNorm TODO; ``batchnorm=True`` completes the standard
    ResNet form (convs lose their bias, BN supplies scale/shift, running
    stats thread through :meth:`apply_train`).
    """

    def __init__(self, in_ch: int, out_ch: int, stride: int = 1,
                 residual: bool = False, batchnorm: bool = False):
        self.conv1 = conv3x3(in_ch, out_ch, stride, bias=not batchnorm)
        self.conv2 = (conv3x3(out_ch, out_ch, bias=not batchnorm)
                      if residual else None)
        self.residual = residual
        self.batchnorm = batchnorm
        self.bn1 = BatchNorm2d(out_ch) if batchnorm else None
        self.bn2 = (BatchNorm2d(out_ch) if batchnorm and residual
                    else None)
        self.proj = (conv1x1(in_ch, out_ch, stride, bias=False)
                     if residual and (stride != 1 or in_ch != out_ch)
                     else None)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        p = {"conv1": self.conv1.init(k1)}
        if self.conv2 is not None:
            p["conv2"] = self.conv2.init(k2)
        if self.proj is not None:
            p["proj"] = self.proj.init(k3)
        if self.bn1 is not None:
            p["bn1"] = self.bn1.init(k4)
        if self.bn2 is not None:
            p["bn2"] = self.bn2.init(k5)
        return p

    def _forward(self, params, x, bn_fn):
        """Shared forward; ``bn_fn(bn_module, bn_params, t) -> (t, new_p)``
        selects eval-mode vs stat-updating batch norm."""
        new_params = dict(params)
        y = self.conv1.apply(params["conv1"], x)
        if self.bn1 is not None:
            y, new_params["bn1"] = bn_fn(self.bn1, params["bn1"], y)
        y = ops.relu(y)
        if not self.residual:
            return y, new_params
        y = self.conv2.apply(params["conv2"], y)
        if self.bn2 is not None:
            y, new_params["bn2"] = bn_fn(self.bn2, params["bn2"], y)
        shortcut = (self.proj.apply(params["proj"], x)
                    if self.proj is not None else x)
        return ops.relu(y + shortcut), new_params

    def apply(self, params, x, *, train=False, rng=None):
        def bn_eval(bn, p, t):
            return bn.apply(p, t, train=train), p
        y, _ = self._forward(params, x, bn_eval)
        return y

    def apply_train(self, params, x, *, rng=None):
        def bn_train(bn, p, t):
            return bn.apply_train(p, t)
        return self._forward(params, x, bn_train)
