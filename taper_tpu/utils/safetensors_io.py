"""safetensors interop: the HF ecosystem's checkpoint file format.

Completes the checkpoint story (`models/hf.py` converts LAYOUTS; this
reads/writes the FILES): a user can load a downloaded
``model.safetensors`` straight through ``load_flat`` →
``params_from_gpt2_state_dict``/``params_from_llama_state_dict``, and
export a trained params pytree back out for any safetensors consumer.

Pytree keys flatten to dotted path strings ("blocks.0.attn.wq") —
the same convention torch ``state_dict`` uses — so round-trips need a
``like`` tree only for structure, never for data.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["save_params", "load_flat", "load_params"]


def _key(path) -> str:
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return ".".join(parts)


def save_params(path: str, params) -> int:
    """Write a params pytree as a safetensors file (dotted-path keys).
    Returns the number of tensors written."""
    from safetensors.numpy import save_file
    flat = {_key(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    save_file(flat, path)
    return len(flat)


def load_flat(path: str) -> Dict[str, np.ndarray]:
    """Read a safetensors file as ``{name: array}`` — directly usable
    as the ``state_dict`` argument of the ``models/hf.py`` converters
    (HF checkpoints use the same dotted naming)."""
    from safetensors.numpy import load_file
    return load_file(path)


def load_params(path: str, like):
    """Read a safetensors file back into the STRUCTURE of ``like``
    (a params pytree with matching dotted paths); arrays are returned
    as jnp with the saved dtypes."""
    flat = load_flat(path)

    def pick(p, leaf):
        k = _key(p)
        assert k in flat, f"missing tensor {k!r} in {path}"
        v = flat[k]
        assert tuple(v.shape) == tuple(leaf.shape), (k, v.shape,
                                                     leaf.shape)
        return jnp.asarray(v)

    out = jax.tree_util.tree_map_with_path(pick, like)
    extra = set(flat) - {_key(p) for p, _ in
                         jax.tree_util.tree_flatten_with_path(like)[0]}
    assert not extra, f"unused tensors in {path}: {sorted(extra)[:5]}"
    return out
