"""ResNet-8 for CIFAR-10 (the BASELINE.json stretch target).

Standard 3-stage residual net: conv3x3 stem → 3 residual BasicBlocks
(16→32→64 channels, stride-2 downsampling between stages) → global avg
pool → linear head.  8 weighted conv/fc layers total.
"""

from __future__ import annotations

from taper_tpu import nn


class _Stem(nn.Module):
    def __init__(self):
        self.conv = nn.conv3x3(3, 16)

    def init(self, key):
        return self.conv.init(key)

    def apply(self, params, x, *, train=False, rng=None):
        from taper_tpu import ops
        return ops.relu(self.conv.apply(params, x))


def resnet8(num_classes: int = 10) -> nn.Sequential:
    return nn.Sequential(
        _Stem(),
        nn.BasicBlock(16, 16, residual=True),
        nn.BasicBlock(16, 32, stride=2, residual=True),
        nn.BasicBlock(32, 64, stride=2, residual=True),
        nn.AdaptiveAvgPool2d.global_(),
        nn.Flatten(),
        nn.Linear(64, num_classes),
    )
