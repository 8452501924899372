"""Checkpoint save **and load** (the reference only saves — ``train.rs:264-292``
writes a text format and has no loader anywhere; SURVEY.md §5.4).

Format: a single ``.npz`` holding every leaf of the checkpoint pytree, keyed
by its tree path, plus the structure recorded implicitly by a template at
load time.  Works for params, optimizer state, or any nested dict/list of
arrays; metadata (epoch, metrics, ...) rides along as object-free scalars.
"""

from __future__ import annotations

import json
import os
import threading
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


def load_checkpoint(path: str, template: Any, shardings: Any = None):
    """Restore a pytree with the structure of ``template`` from ``path``.

    Returns ``(tree, metadata)``.  Every leaf present in the template must
    exist in the file with a matching shape.

    ``shardings`` (optional) is a pytree with the same structure whose
    leaves are ``jax.sharding.Sharding`` (or ``None``): each restored leaf
    is ``jax.device_put`` with its sharding, so a multi-chip run can load
    a checkpoint directly into its mesh layout — including a layout
    *different* from the one that saved it (the file stores full host
    arrays, so restore-with-resharding is free).
    """
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    shard_leaves = (jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: x is None)
        if shardings is not None else [None] * len(paths))
    if len(shard_leaves) != len(paths):
        raise ValueError(
            f"shardings tree has {len(shard_leaves)} leaves, template has "
            f"{len(paths)}")
    leaves = []
    for (p, tmpl), shard in zip(paths, shard_leaves):
        key = f"leaf::{_path_str(p)}"
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs "
                f"template {np.shape(tmpl)}")
        arr = arr.astype(np.asarray(tmpl).dtype)
        leaves.append(jax.device_put(arr, shard) if shard is not None
                      else arr)
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    metadata = {k[len("meta::"):]: stored[k].item()
                for k in stored if k.startswith("meta::")}
    return tree, metadata


class CheckpointManager:
    """Rotating checkpoint directory with retention policy and async save.

    The reference stops at a single write-only text dump
    (``train.rs:264-292``); a production trainer needs the surrounding
    machinery, which this provides:

    * ``save(step, tree)`` writes ``ckpt_<step>.npz`` (atomic rename);
    * keeps the newest ``max_to_keep`` steps, PLUS the ``keep_best``
      steps by ``metric`` (``mode='min'`` for losses, ``'max'`` for
      accuracies) — a best-val checkpoint survives rotation;
    * ``async_save=True`` snapshots the tree to host synchronously (so
      later in-place mutation or buffer donation cannot corrupt the
      file) and does the npz write on a background thread — training
      continues while bytes hit disk; ``wait()`` joins;
    * ``restore(template, step=None, shardings=None)`` loads the given
      (default: latest) step, with optional resharding onto a mesh.

    A ``manifest.json`` in the directory records step → (file, metric)
    and is rewritten atomically after every save/rotation, so a killed
    run resumes from whatever the manifest last committed.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 keep_best: int = 0, mode: str = "min",
                 async_save: bool = False):
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
        self.directory = directory
        self.max_to_keep = max_to_keep
        self.keep_best = keep_best
        self.mode = mode
        self.async_save = async_save
        self._lock = threading.Lock()
        self._pending: Optional[threading.Thread] = None
        self._pending_error: Optional[BaseException] = None
        os.makedirs(directory, exist_ok=True)
        self._manifest: Dict[str, Dict] = self._read_manifest()

    # -- manifest -----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "manifest.json")

    def _read_manifest(self) -> Dict[str, Dict]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _write_manifest(self) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    # -- queries ------------------------------------------------------
    def all_steps(self):
        return sorted(int(s) for s in self._manifest)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def best_step(self) -> Optional[int]:
        scored = [(int(s), e["metric"]) for s, e in self._manifest.items()
                  if e.get("metric") is not None]
        if not scored:
            return None
        sign = 1 if self.mode == "min" else -1
        return min(scored, key=lambda kv: (sign * kv[1], -kv[0]))[0]

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:010d}.npz")

    # -- save ---------------------------------------------------------
    def save(self, step: int, tree: Any,
             metadata: Optional[Dict[str, float]] = None,
             metric: Optional[float] = None) -> str:
        """Write ``tree`` for ``step``; returns the checkpoint path.

        With ``async_save`` the device→host fetch happens here (the
        point-in-time snapshot) and the disk write on a worker thread.
        """
        # Snapshot on the caller's thread: jax.Array leaves fetch to
        # host; mutable numpy leaves are copied.
        host_tree = jax.tree.map(lambda x: np.array(x), tree)
        path = self._step_path(step)

        def commit():
            try:
                save_checkpoint(path, host_tree, metadata)
                with self._lock:
                    self._manifest[str(step)] = {
                        "file": os.path.basename(path),
                        "metric": (None if metric is None
                                   else float(metric)),
                    }
                    self._rotate_locked()
                    self._write_manifest()
            except BaseException as e:     # surfaced by wait()/next save
                self._pending_error = e

        if self.async_save:
            self.wait()                       # one in-flight write at a time
            self._pending = threading.Thread(target=commit, daemon=True)
            self._pending.start()
        else:
            commit()
            self._raise_pending_error()
        return path

    def _raise_pending_error(self) -> None:
        e, self._pending_error = self._pending_error, None
        if e is not None:
            raise RuntimeError(
                "checkpoint save failed (no manifest entry was "
                "written for that step)") from e

    def wait(self) -> None:
        """Block until any in-flight async save has committed; re-raises
        a worker-thread failure instead of swallowing it (a silently
        missing checkpoint is discovered at restore time — too late)."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        self._raise_pending_error()

    def _rotate_locked(self) -> None:
        steps = sorted(int(s) for s in self._manifest)
        keep = set(steps[-self.max_to_keep:] if self.max_to_keep else steps)
        if self.keep_best:
            sign = 1 if self.mode == "min" else -1
            scored = sorted(
                ((s, self._manifest[str(s)]["metric"]) for s in steps
                 if self._manifest[str(s)].get("metric") is not None),
                key=lambda kv: (sign * kv[1], -kv[0]))
            keep.update(s for s, _ in scored[:self.keep_best])
        for s in steps:
            if s not in keep:
                entry = self._manifest.pop(str(s))
                try:
                    os.remove(os.path.join(self.directory, entry["file"]))
                except OSError:
                    pass

    # -- restore ------------------------------------------------------
    def restore(self, template: Any, step: Optional[int] = None,
                shardings: Any = None):
        """Load ``step`` (default: latest); returns ``(tree, metadata)``."""
        self.wait()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints in {self.directory}")
        if str(step) not in self._manifest:
            raise KeyError(f"step {step} not in manifest "
                           f"(have {self.all_steps()})")
        return load_checkpoint(self._step_path(step), template, shardings)


# ---------------------------------------------------------------------------
# Sharded (per-device-shard) checkpoint format — distributed checkpointing.
# ---------------------------------------------------------------------------

def _leaf_key(path) -> str:
    # filesystem-safe leaf key ('/' would create directories)
    return _path_str(path).replace("/", ".")


def save_checkpoint_sharded(directory: str, tree: Any,
                            metadata: Optional[Dict[str, float]] = None,
                            max_workers: int = 8) -> None:
    """Save a pytree of (possibly sharded) arrays as one file PER SHARD.

    The npz format (:func:`save_checkpoint`) gathers every array to a
    single host buffer; for mesh-sharded params that is an all-gather
    plus a serial write.  This format instead writes each device shard
    of each leaf as its own ``<leaf>.shard<k>.npy`` (parallel writes on
    a thread pool — numpy releases the GIL during IO) with the shard's
    index recorded in ``manifest.json``, the orbax-style layout that a
    multi-host pod writes without any cross-host gather (each process
    saves only its addressable shards; on this single-process setup
    that is all of them).  Replicated/unsharded leaves write one file.

    ``manifest.json`` is committed atomically LAST, so a partial write
    is never loadable.

    Multi-host correct: the manifest is built from the sharding's GLOBAL
    index map (known on every process without touching data), each
    process writes only the replica-0 shards it can address, shard
    filenames are keyed by the shard's global offsets (deterministic
    across processes), and only process 0 writes the manifest — behind
    barriers so it lands after every host's shards and no host returns
    before it exists.  At one process this reduces exactly to the
    single-host behavior.
    """
    import concurrent.futures

    from taper_tpu.parallel import multihost

    os.makedirs(directory, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    manifest: Dict[str, Any] = {"leaves": {}, "metadata": metadata or {}}
    jobs = []
    for path, leaf in leaves:
        key = _leaf_key(path)
        arr = leaf
        shape = tuple(np.shape(arr))
        entry = {"shape": list(shape),
                 "dtype": str(getattr(arr, "dtype", None)
                              or np.asarray(arr).dtype),
                 "shards": []}

        def norm(ix):
            return tuple((0 if s.start is None else int(s.start),
                          dim if s.stop is None else int(s.stop))
                         for s, dim in zip(ix, shape))

        def shard_file(idx):
            tag = "_".join(str(s) for s, _ in idx) or "0"
            return f"{key}.shard{tag}.npy"

        if isinstance(arr, jax.Array) and len(arr.sharding.device_set) > 1:
            # global enumeration — every process computes the SAME list
            idx_map = arr.sharding.devices_indices_map(shape)
            for idx in sorted(set(norm(ix) for ix in idx_map.values())):
                entry["shards"].append({"file": shard_file(idx),
                                        "index": [list(p) for p in idx]})
            # write only what this process owns, one copy per index
            for shard in arr.addressable_shards:
                if shard.replica_id != 0:
                    continue
                jobs.append((os.path.join(
                    directory, shard_file(norm(shard.index))), shard.data))
        else:
            fname = f"{key}.npy"
            entry["shards"].append({
                "file": fname,
                "index": [[0, d] for d in shape]})
            # host-replicated (non-jax) leaves: primary writes once;
            # a single-device jax.Array: its owning process writes
            owns = (arr.is_fully_addressable if isinstance(arr, jax.Array)
                    else multihost.is_primary())
            if owns:
                jobs.append((os.path.join(directory, fname), arr))
        manifest["leaves"][key] = entry

    def write(job):
        fpath, data = job
        np.save(fpath + ".tmp.npy", np.asarray(data))
        os.replace(fpath + ".tmp.npy", fpath)

    with concurrent.futures.ThreadPoolExecutor(max_workers) as ex:
        list(ex.map(write, jobs))

    multihost.sync("ckpt_shards_written")   # all hosts' shards on disk
    if multihost.is_primary():
        tmp = os.path.join(directory, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(directory, "manifest.json"))
    multihost.sync("ckpt_manifest_written")  # nobody returns pre-manifest


def load_checkpoint_sharded(directory: str, template: Any,
                            shardings: Any = None):
    """Restore a :func:`save_checkpoint_sharded` directory.

    Shards reassemble on host per leaf, then ``jax.device_put`` with the
    corresponding ``shardings`` leaf (restore-with-resharding: the target
    mesh layout is free to differ from the one that saved).  Returns
    ``(tree, metadata)``.
    """
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    shard_leaves = (jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: x is None)
        if shardings is not None else [None] * len(paths))
    if len(shard_leaves) != len(paths):
        raise ValueError(
            f"shardings tree has {len(shard_leaves)} leaves, template "
            f"has {len(paths)}")
    leaves = []
    for (path, tmpl), shard in zip(paths, shard_leaves):
        key = _leaf_key(path)
        if key not in manifest["leaves"]:
            raise KeyError(f"checkpoint missing leaf {key}")
        entry = manifest["leaves"][key]
        if tuple(entry["shape"]) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint "
                f"{tuple(entry['shape'])} vs template {np.shape(tmpl)}")
        out = np.empty(tuple(entry["shape"]), dtype=entry["dtype"])
        for s in entry["shards"]:
            piece = np.load(os.path.join(directory, s["file"]))
            if piece.dtype != out.dtype:
                # ml_dtypes leaves (bfloat16/float8) round-trip through
                # np.save as raw void records (|V2/|V1) — reinterpret
                # the bytes; itemsizes must agree
                assert piece.dtype.itemsize == out.dtype.itemsize, (
                    key, piece.dtype, out.dtype)
                piece = piece.view(out.dtype)
            sl = tuple(slice(a, b) for a, b in s["index"])
            out[sl] = piece
        out = out.astype(np.asarray(tmpl).dtype)
        leaves.append(jax.device_put(out, shard) if shard is not None
                      else out)
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return tree, manifest.get("metadata", {})
