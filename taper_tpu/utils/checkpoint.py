"""Checkpoint save **and load** (the reference only saves — ``train.rs:264-292``
writes a text format and has no loader anywhere; SURVEY.md §5.4).

Format: a single ``.npz`` holding every leaf of the checkpoint pytree, keyed
by its tree path, plus the structure recorded implicitly by a template at
load time.  Works for params, optimizer state, or any nested dict/list of
arrays; metadata (epoch, metrics, ...) rides along as object-free scalars.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path: str, tree: Any,
                    metadata: Optional[Dict[str, float]] = None) -> None:
    """Serialize a pytree of arrays to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {f"leaf::{_path_str(p)}": np.asarray(v) for p, v in leaves}
    for k, v in (metadata or {}).items():
        payload[f"meta::{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any):
    """Restore a pytree with the structure of ``template`` from ``path``.

    Returns ``(tree, metadata)``.  Every leaf present in the template must
    exist in the file with a matching shape.
    """
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in paths:
        key = f"leaf::{_path_str(p)}"
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs "
                f"template {np.shape(tmpl)}")
        leaves.append(arr.astype(np.asarray(tmpl).dtype))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    metadata = {k[len("meta::"):]: stored[k].item()
                for k in stored if k.startswith("meta::")}
    return tree, metadata
