"""Ahead-of-time compiled and serialized serving programs.

The reference ships as a native binary (Rust, see
/root/reference/README.md) so its serving cold start is process launch;
a JAX process normally pays Python trace + XLA compile on the first call
of every program.  This module closes that gap the TPU-native way:

* :func:`aot_compile` — lower + compile a jitted function NOW (instead
  of on first call) and hand back the executable plus its compiler cost
  analysis, so serving processes can warm every shape bucket at startup
  and surface flop/byte estimates before traffic arrives.
* :func:`export_program` / :func:`save_program` / :func:`load_program` —
  serialize the traced program (StableHLO via ``jax.export``) to a
  self-contained artifact.  A later process — which does not even need
  the model code, only the params pytree — deserializes and runs it with
  zero Python tracing.  Artifacts record the platforms they were lowered
  for (e.g. ``('tpu',)``) and refuse to run elsewhere.

Shapes are static (XLA's compilation model): export one program per
serving shape bucket (batch, prompt-pad length), exactly like production
TPU serving stacks do.  The params pytree must use standard containers
(dict/list/tuple) — ours do — or be registered via
``jax.export.register_pytree_node_serialization``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
from jax import export as _export

__all__ = ["aot_compile", "export_program", "save_program",
           "load_program", "deserialize_program"]


def _as_jitted(fn: Callable) -> Any:
    """``jax.export``/AOT lowering operate on jitted callables."""
    return fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)


def aot_compile(fn: Callable, *args, **kwargs):
    """Compile ``fn`` for the given example args ahead of the first call.

    Returns ``(compiled, cost)`` where ``compiled(*args, **kwargs)`` is
    the ready executable (no trace/compile on call) and ``cost`` is
    XLA's cost analysis dict (``flops``, ``bytes accessed``, ...; may be
    empty on backends that don't report it).  Example args may be real
    arrays or ``jax.ShapeDtypeStruct``s — only shapes/dtypes matter.
    """
    lowered = _as_jitted(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = dict(compiled.cost_analysis() or {})
    except Exception:            # pragma: no cover - backend-dependent
        cost = {}
    return compiled, cost


def export_program(fn: Callable, *args,
                   platforms: Optional[Sequence[str]] = None,
                   **kwargs):
    """Trace ``fn`` at the example args and return a ``jax.export``
    ``Exported`` (call ``.serialize()`` for bytes, ``.call`` to run).

    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` to build one artifact runnable on both.
    """
    jfn = _as_jitted(fn)
    if platforms is not None:
        return _export.export(jfn, platforms=tuple(platforms))(
            *args, **kwargs)
    return _export.export(jfn)(*args, **kwargs)


def save_program(path: str, fn: Callable, *args,
                 platforms: Optional[Sequence[str]] = None,
                 **kwargs) -> int:
    """Export ``fn`` and write the serialized artifact to ``path``
    atomically (tmp + rename).  Returns the artifact size in bytes."""
    exp = export_program(fn, *args, platforms=platforms, **kwargs)
    blob = exp.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return len(blob)


def deserialize_program(blob: bytes) -> Callable:
    """Rebuild a runnable callable from serialized bytes.

    The returned callable is jitted (compiled once per process, cached
    after) and checks platform compatibility at call time.
    """
    exp = _export.deserialize(blob if isinstance(blob, bytearray)
                              else bytearray(blob))
    return jax.jit(exp.call)


def load_program(path: str) -> Callable:
    """Read an artifact written by :func:`save_program` and return the
    runnable callable — no model code required in this process."""
    with open(path, "rb") as f:
        return deserialize_program(f.read())
