"""ResNet-8 for CIFAR-10 (the BASELINE.json stretch target).

Standard 3-stage residual net: conv3x3 stem → 3 residual BasicBlocks
(16→32→64 channels, stride-2 downsampling between stages) → global avg
pool → linear head.  8 weighted conv/fc layers total.  ``batchnorm=True``
(the default) uses real BatchNorm with running statistics threaded through
``Module.apply_train`` — completing the reference's BatchNorm TODO
(``src/nn.rs:846``).
"""

from __future__ import annotations

import jax

from taper_tpu import nn


class _Stem(nn.Module):
    def __init__(self, batchnorm: bool = False):
        self.conv = nn.conv3x3(3, 16, bias=not batchnorm)
        self.bn = nn.BatchNorm2d(16) if batchnorm else None

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"conv": self.conv.init(k1)}
        if self.bn is not None:
            p["bn"] = self.bn.init(k2)
        return p

    def apply(self, params, x, *, train=False, rng=None):
        from taper_tpu import ops
        y = self.conv.apply(params["conv"], x)
        if self.bn is not None:
            y = self.bn.apply(params["bn"], y, train=train)
        return ops.relu(y)

    def apply_train(self, params, x, *, rng=None):
        from taper_tpu import ops
        y = self.conv.apply(params["conv"], x)
        new_params = dict(params)
        if self.bn is not None:
            y, new_params["bn"] = self.bn.apply_train(params["bn"], y)
        return ops.relu(y), new_params


def resnet8(num_classes: int = 10, batchnorm: bool = True) -> nn.Sequential:
    return nn.Sequential(
        _Stem(batchnorm),
        nn.BasicBlock(16, 16, residual=True, batchnorm=batchnorm),
        nn.BasicBlock(16, 32, stride=2, residual=True, batchnorm=batchnorm),
        nn.BasicBlock(32, 64, stride=2, residual=True, batchnorm=batchnorm),
        nn.AdaptiveAvgPool2d.global_(),
        nn.Flatten(),
        nn.Linear(64, num_classes),
    )
