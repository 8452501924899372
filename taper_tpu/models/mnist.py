"""MNIST model architectures from the reference examples."""

from __future__ import annotations

from taper_tpu import nn


def mnist_mlp() -> nn.Sequential:
    """784-128-64-10 ReLU MLP (reference ``examples/train_mnist.rs:34-40``).

    Activations are fused into the Linear layers' Pallas epilogues.
    """
    return nn.Sequential(
        nn.Linear(784, 128, activation="relu"),
        nn.Linear(128, 64, activation="relu"),
        nn.Linear(64, 10),
    )


class _Reshape(nn.Module):
    def __init__(self, shape):
        self.shape = shape

    def apply(self, params, x, *, train=False, rng=None):
        return x.reshape((x.shape[0],) + tuple(self.shape))


def mnist_cnn() -> nn.Sequential:
    """The reference CNN (``examples/train_mnist_cnn.rs:35-100``):

    Conv2dReLU 1→32→32 + pool, 32→64→64 + pool, 64→128,
    global avg pool, FC 128-128-64-10.

    Takes flat ``[B, 784]`` input (the reference reshapes per batch,
    ``train_mnist_cnn.rs:162``).
    """
    return nn.Sequential(
        _Reshape((1, 28, 28)),
        nn.Conv2dReLU(1, 32, 3, padding=1),
        nn.Conv2dReLU(32, 32, 3, padding=1),
        nn.MaxPool2d.new_2x2(),
        nn.Conv2dReLU(32, 64, 3, padding=1),
        nn.Conv2dReLU(64, 64, 3, padding=1),
        nn.MaxPool2d.new_2x2(),
        nn.Conv2dReLU(64, 128, 3, padding=1),
        nn.AdaptiveAvgPool2d.global_(),
        nn.Flatten(),
        nn.Linear(128, 128, activation="relu"),
        nn.Linear(128, 64, activation="relu"),
        nn.Linear(64, 10),
    )


def xor_mlp() -> nn.Sequential:
    """2-4-1 sigmoid MLP (reference ``src/main.rs:20-50``)."""
    return nn.Sequential(
        nn.Linear(2, 4, activation="sigmoid"),
        nn.Linear(4, 1, activation="sigmoid"),
    )
