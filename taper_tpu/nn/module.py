"""Functional module system.

The reference's ``Module`` trait (``src/nn.rs:10-18``) is an OO
``forward``/``parameters`` pair over tensors that mutate a thread-local tape.
The TPU-native equivalent is functional: a ``Module`` holds only *static*
hyper-parameters (shapes, strides, flags) and exposes

* ``init(key) -> params``  — build the parameter pytree for this module;
* ``apply(params, x, *, train=False, rng=None) -> y`` — pure forward pass.

Because ``apply`` is pure, ``jax.grad(loss_fn)`` differentiates the whole
model and ``jax.jit`` compiles forward+backward+update into one XLA program —
the design replacing the reference's dynamic tape (``src/tape.rs``).

Params are plain dicts / lists of ``jnp.ndarray`` (valid pytrees), so they
compose with optimizers, checkpointing, sharding and quantization transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Module:
    """Base class: static config + pure ``init``/``apply``."""

    def init(self, key):
        """Return this module's parameter pytree (default: stateless)."""
        return {}

    def apply(self, params, x, *, train: bool = False, rng=None):
        raise NotImplementedError

    def apply_train(self, params, x, *, rng=None):
        """Training-mode forward returning ``(y, new_params)`` where
        ``new_params`` carries updated non-trainable state (BatchNorm
        running statistics; leaves prefixed ``running_``).

        Stateless modules return their params unchanged; containers and
        stateful layers override.  The Trainer uses this path whenever the
        parameter tree contains stateful leaves, merging them back after
        the optimizer step (which masks them out).
        """
        return self.apply(params, x, train=True, rng=rng), params

    # Convenience: one-shot init+apply for tests/prototyping.
    def init_with_output(self, key, x, **kw):
        params = self.init(key)
        return params, self.apply(params, x, **kw)

    def param_count(self, params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))

    def param_bytes(self, params) -> int:
        return sum(p.size * p.dtype.itemsize
                   for p in jax.tree_util.tree_leaves(params))


class Sequential(Module):
    """Composition of modules; params is a list of per-layer pytrees.

    Mirrors the reference's ``Sequential`` fold (``src/nn.rs:130-157``).
    """

    def __init__(self, *layers: Module):
        if len(layers) == 1 and isinstance(layers[0], (list, tuple)):
            layers = tuple(layers[0])
        self.layers = list(layers)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.layers), 1))
        return [layer.init(k) for layer, k in zip(self.layers, keys)]

    def apply(self, params, x, *, train=False, rng=None):
        rngs = (jax.random.split(rng, len(self.layers))
                if rng is not None else [None] * len(self.layers))
        for layer, p, r in zip(self.layers, params, rngs):
            x = layer.apply(p, x, train=train, rng=r)
        return x

    def apply_train(self, params, x, *, rng=None):
        rngs = (jax.random.split(rng, len(self.layers))
                if rng is not None else [None] * len(self.layers))
        new_params = []
        for layer, p, r in zip(self.layers, params, rngs):
            x, p_new = layer.apply_train(p, x, rng=r)
            new_params.append(p_new)
        return x, new_params

    def __iter__(self):
        return iter(self.layers)

    def __len__(self):
        return len(self.layers)

    def __getitem__(self, i):
        return self.layers[i]
