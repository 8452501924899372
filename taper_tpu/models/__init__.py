"""Model zoo: the reference's example architectures as factory functions."""

from taper_tpu.models.mnist import mnist_mlp, mnist_cnn, xor_mlp
from taper_tpu.models.resnet import resnet8
from taper_tpu.models.transformer import TinyGPT
from taper_tpu.models.vit import ViT, vit_cifar

__all__ = ["mnist_mlp", "mnist_cnn", "xor_mlp", "resnet8", "TinyGPT",
           "ViT", "vit_cifar"]
