"""Vision Transformer (beyond-reference model family).

Third architecture class after the MLP/CNN/ResNet (reference scope) and
the causal LM (TinyGPT): non-causal attention over image patches.
TPU-first choices: patch embedding is a reshape + one fused GEMM (no
strided conv — the patch grid IS a reshape), mean pooling instead of a
CLS token (one fewer ragged position; the sequence stays lane-friendly),
pre-LN blocks over ``ops.attention`` (flash on the pallas backend when
the patch count crosses the measured S≥1024 threshold).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from taper_tpu.nn.module import Module
from taper_tpu.nn.transformer import (Embedding, LayerNorm,
                                      TransformerBlock)
from taper_tpu import ops


class ViT(Module):
    """ViT classifier: ``[B, C, H, W] -> logits [B, num_classes]``."""

    def __init__(self, image_size: int = 32, patch: int = 4,
                 in_channels: int = 3, num_classes: int = 10,
                 dim: int = 96, depth: int = 4, num_heads: int = 4,
                 mlp_ratio: int = 4, dropout: float = 0.0,
                 compute_dtype: Optional[jnp.dtype] = None):
        assert image_size % patch == 0, (image_size, patch)
        self.patch = patch
        self.in_channels = in_channels
        self.grid = image_size // patch
        self.n_patches = self.grid * self.grid
        self.patch_dim = in_channels * patch * patch
        self.dim = dim
        self.depth = depth
        self.num_classes = num_classes
        self.compute_dtype = compute_dtype
        self.pos = Embedding(self.n_patches, dim)
        self.blocks = [TransformerBlock(dim, num_heads, causal=False,
                                        mlp_ratio=mlp_ratio,
                                        dropout=dropout)
                       for _ in range(depth)]
        self.ln_f = LayerNorm(dim)

    def init(self, key):
        ks = jax.random.split(key, 3 + self.depth)
        p = {
            "embed": {
                "w": jax.random.normal(
                    ks[0], (self.dim, self.patch_dim),
                    jnp.float32) * (self.patch_dim ** -0.5),
                "b": jnp.zeros((self.dim,), jnp.float32),
            },
            "pos": self.pos.init(ks[1]),
            "blocks": [blk.init(k)
                       for blk, k in zip(self.blocks, ks[2:-1])],
            "ln_f": self.ln_f.init(ks[-1]),
            "head": {
                "w": jnp.zeros((self.num_classes, self.dim), jnp.float32),
                "b": jnp.zeros((self.num_classes,), jnp.float32),
            },
        }
        return p

    def _patchify(self, x):
        """[B, C, H, W] -> [B, n_patches, C*p*p] (pure reshapes)."""
        b, c, h, w = x.shape
        p = self.patch
        g = self.grid
        x = x.reshape(b, c, g, p, g, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)        # [B, gh, gw, C, p, p]
        return x.reshape(b, g * g, c * p * p)

    def apply(self, params, x, *, train=False, rng=None):
        b = x.shape[0]
        patches = self._patchify(x)
        e = ops.linear(patches.reshape(b * self.n_patches, -1),
                       params["embed"]["w"], params["embed"]["b"])
        h = e.reshape(b, self.n_patches, self.dim)
        h = h + self.pos.apply(params["pos"],
                               jnp.arange(self.n_patches))
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        rngs = (jax.random.split(rng, self.depth)
                if rng is not None else [None] * self.depth)
        for blk, bp, r in zip(self.blocks, params["blocks"], rngs):
            h = blk.apply(bp, h, train=train, rng=r)
        h = self.ln_f.apply(params["ln_f"], h).astype(jnp.float32)
        pooled = jnp.mean(h, axis=1)              # mean-pool the patches
        return ops.linear(pooled, params["head"]["w"],
                          params["head"]["b"])


def vit_cifar(dim: int = 96, depth: int = 4, num_heads: int = 4,
              **kw) -> ViT:
    """CIFAR-sized ViT (32x32, patch 4 -> 64 tokens)."""
    return ViT(image_size=32, patch=4, in_channels=3, num_classes=10,
               dim=dim, depth=depth, num_heads=num_heads, **kw)
