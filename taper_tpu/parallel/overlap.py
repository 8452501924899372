"""Ring collective-matmul: communication/compute overlap for TP layers.

The scaling-book recipe for tensor parallelism has two communication
shapes around every sharded matmul:

* **all-gather then matmul** (column-parallel layer entry):
  ``Y = all_gather(X) @ W_local``
* **matmul then reduce-scatter** (row-parallel layer exit):
  ``Y_local = reduce_scatter(X_local @ W_local)``

Issued as monolithic collectives, the ICI transfer serializes with the
MXU work.  The ring decomposition below splits each collective into
``n`` chunk steps and interleaves them with the ``n`` partial matmuls,
so on real hardware the chunk-``j`` DMA (``lax.ppermute`` over the ring)
runs while chunk ``j-1``'s matmul occupies the MXU — the async-DMA
overlap XLA's scheduler applies to ppermute+dot sequences inside one
program (the same transformation XLA's own ``collective-matmul`` pass
performs for GSPMD programs; here it is explicit and composes with
``shard_map``-level code like the Pallas kernels, where GSPMD cannot
see).  The ring is unrolled (mesh axis sizes are small static ints), so
every step's dot and ppermute are separate HLOs the scheduler can
interleave.  No reference counterpart (SURVEY.md §2.9: the reference
has no distributed anything); this is TPU-native infrastructure.

Both primitives are differentiable (ppermute and dot transpose cleanly)
and equality-tested against the monolithic-collective oracle for
outputs AND gradients on the 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def allgather_matmul(mesh: Mesh, x, w, *, axis: str = "model",
                     w_col_axis: str = None):
    """``all_gather(x, axis) @ w`` with the gather decomposed into a ring.

    ``x``: ``[m_global, k]`` sharded over rows on ``axis``; ``w``:
    ``[k, f]`` — replicated by default, or column-sharded over
    ``w_col_axis`` (a DIFFERENT mesh axis; the output's columns are then
    sharded the same way).  Returns ``[m_global, f]`` with the row axis
    unsharded.  ``m_global`` must divide by the ``axis`` size.

    Each of the ``n`` ring steps matmuls the currently-held x chunk into
    its row block of the output and forwards the chunk to the next
    device, so chunk transfer overlaps the previous chunk's matmul.
    """
    n = int(mesh.shape[axis])
    if x.shape[0] % n:
        raise ValueError(f"rows {x.shape[0]} not divisible by "
                         f"{axis}={n}")
    if w_col_axis == axis:
        raise ValueError("w_col_axis must differ from the gather axis")
    perm = [(s, (s + 1) % n) for s in range(n)]

    def local(x, w):
        i = jax.lax.axis_index(axis)
        m_l = x.shape[0]
        out = jnp.zeros((n * m_l, w.shape[1]), x.dtype)
        chunk = x
        for j in range(n):
            src = (i - j) % n          # who this chunk came from
            out = jax.lax.dynamic_update_slice_in_dim(
                out, (chunk @ w).astype(out.dtype), src * m_l, axis=0)
            if j < n - 1:
                chunk = jax.lax.ppermute(chunk, axis, perm)
        return out

    w_spec = P(None, w_col_axis)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis, None), w_spec),
                       out_specs=P(None, w_col_axis), check_vma=False)
    return fn(x, w)


def matmul_reducescatter(mesh: Mesh, x, w, *, axis: str = "model"):
    """``reduce_scatter(x @ w, axis)`` with the reduction rung as a ring.

    Contraction-sharded inputs: ``x`` ``[m, k_local]``, ``w``
    ``[k_local, f]`` (global contraction ``n*k_local``); the full product
    is the SUM over devices.  Returns ``[m/n, f]`` row-sharded on
    ``axis`` — device ``i`` holds the fully-reduced row block ``i``.

    The accumulator that finishes on device ``i`` is born on device
    ``i+1`` and visits every device once, picking up each one's partial
    for output block ``i`` on the way; at step ``j`` device ``d`` is
    therefore serving block ``(d − 1 − j) mod n``.  The accumulator
    hand-off overlaps the next partial's matmul.  ``m`` must divide by
    the axis size.
    """
    n = int(mesh.shape[axis])
    if x.shape[0] % n:
        raise ValueError(f"rows {x.shape[0]} not divisible by "
                         f"{axis}={n}")
    perm = [(s, (s + 1) % n) for s in range(n)]

    def local(x, w):
        i = jax.lax.axis_index(axis)
        m = x.shape[0]
        m_l = m // n
        acc = jnp.zeros((m_l, w.shape[1]), jnp.float32)
        for j in range(n):
            b = (i - 1 - j) % n        # block the rotating acc serves
            part = jax.lax.dynamic_slice_in_dim(x, b * m_l, m_l, 0) @ w
            acc = acc + part.astype(jnp.float32)
            if j < n - 1:              # after the last add acc is home
                acc = jax.lax.ppermute(acc, axis, perm)
        return acc.astype(x.dtype)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(None, axis), P(axis, None)),
                       out_specs=P(axis, None), check_vma=False)
    return fn(x, w)
