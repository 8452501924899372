"""Jit-safe image augmentation (train-time only).

Beyond-reference scope (the reference trains raw MNIST tensors with no
augmentation anywhere): the standard CIFAR-style recipe — pad-reflect +
random crop + horizontal flip — implemented as a pure ``(batch, key) ->
batch`` function so it runs INSIDE the scanned epoch program
(``Trainer(augment=...)``): augmentation happens on-device per step,
costs one vmapped dynamic-slice + a flip select, and adds zero host
traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["random_crop_flip"]


def random_crop_flip(x, key, pad: int = 4, flip: bool = True):
    """Random-crop (after ``pad``-pixel reflect padding) + random
    horizontal flip for an NCHW batch; each image draws its own offsets.
    Pure and shape-preserving — safe inside jit/scan."""
    b, c, h, w = x.shape
    ky, kx, kf = jax.random.split(key, 3)
    out = x
    if pad > 0:
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="reflect")
        oy = jax.random.randint(ky, (b,), 0, 2 * pad + 1)
        ox = jax.random.randint(kx, (b,), 0, 2 * pad + 1)
        out = jax.vmap(
            lambda img, y0, x0: jax.lax.dynamic_slice(
                img, (0, y0, x0), (c, h, w)))(xp, oy, ox)
    if flip:
        do = jax.random.bernoulli(kf, 0.5, (b,))
        out = jnp.where(do[:, None, None, None], out[..., ::-1], out)
    return out
