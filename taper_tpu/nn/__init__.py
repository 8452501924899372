"""NN modules: functional layers over the pluggable op backend."""

from taper_tpu.nn.module import Module, Sequential
from taper_tpu.nn.layers import (
    Linear, ReLU, Sigmoid,
    Conv2d, Conv2dReLU, conv3x3, conv1x1,
    MaxPool2d, AvgPool2d, AdaptiveAvgPool2d,
    Flatten, Dropout, BatchNorm2d, BasicBlock,
)
from taper_tpu.nn.lora import LoRA
from taper_tpu.nn.transformer import (
    LayerNorm, RMSNorm, Embedding, MultiHeadAttention, MLPBlock, TransformerBlock,
    MoEMLP,
)

__all__ = [
    "Module", "Sequential",
    "Linear", "ReLU", "Sigmoid",
    "Conv2d", "Conv2dReLU", "conv3x3", "conv1x1",
    "MaxPool2d", "AvgPool2d", "AdaptiveAvgPool2d",
    "Flatten", "Dropout", "BatchNorm2d", "BasicBlock",
    "LayerNorm", "RMSNorm", "Embedding", "MultiHeadAttention", "MLPBlock",
    "TransformerBlock", "MoEMLP", "LoRA",
]
