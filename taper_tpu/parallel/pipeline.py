"""Pipeline parallelism (SPMD GPipe) over a mesh axis.

The reference has no distribution of any kind (SURVEY.md §2.9); this
completes the framework's parallelism alphabet (DP / TP / ZeRO-1 / SP /
ring / **PP**) the TPU-native way: one SPMD program under ``shard_map``
where every device runs the same schedule and the pipeline structure
lives in data movement, not control flow —

* homogeneous layer params are **stacked** on a leading axis and sharded
  over the ``stage`` mesh axis, so each device holds ``depth / n`` layers;
* the input batch is split into microbatches; at schedule step ``t``
  stage ``s`` processes microbatch ``t − s`` (devices in the bubble
  compute anyway and their results are masked out — predicated compute
  instead of control flow, which is what a TPU wants);
* activations hop stage→stage+1 with ``lax.ppermute`` over ICI each
  step; the last stage's outputs are re-replicated with a masked psum.

Differentiable end-to-end: autodiff transposes the ppermute ring and the
masked psum, so ``jax.grad`` of a loss over :func:`pipeline_apply`
produces exactly the single-device gradients (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_params_list):
    """[per-layer pytree, ...] → one pytree with a leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params_list)


def unstack_layer_params(stacked, n):
    return [jax.tree.map(lambda a, i=i: a[i], stacked) for i in range(n)]


def stage_sharding(mesh: Mesh, stacked_params, axis: str = "model"):
    """Shard the stacked layer axis over the pipeline ``axis``."""
    def rule(leaf):
        spec = (axis,) + (None,) * (leaf.ndim - 1)
        return NamedSharding(mesh, P(*spec))
    return jax.tree.map(rule, stacked_params)


def pipeline_apply(mesh: Mesh, layer_fn, stacked_params, x_mb, *,
                   axis: str = "model"):
    """Run microbatches through a pipelined layer stack.

    ``layer_fn(params_one_layer, x) -> y`` (same shapes for x and y);
    ``stacked_params``: pytree with leading axis ``depth`` (must be
    divisible by the mesh axis size; sharded or shardable over ``axis``);
    ``x_mb``: ``[n_micro, ...]`` microbatched activations (replicated).
    Returns ``[n_micro, ...]`` outputs of the full stack, replicated.
    """
    n = int(mesh.shape[axis])
    n_micro = x_mb.shape[0]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % n == 0, (depth, n)

    def local(params_local, x_mb):
        s = jax.lax.axis_index(axis)
        perm = [(d, d + 1) for d in range(n - 1)]

        def stage(x):
            # this device's span of the stack: scan over its layers
            def body(h, lp):
                return layer_fn(lp, h), None
            return jax.lax.scan(body, x, params_local)[0]

        T = n_micro + n - 1

        def step(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t; others take the handoff
            inject = x_mb[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(s == 0, inject, buf)
            y = stage(x_in)
            # the microbatch leaving the LAST stage at step t is t-(n-1)
            m = t - (n - 1)
            valid = (s == n - 1) & (m >= 0)
            mc = jnp.clip(m, 0, n_micro - 1)
            outs = outs.at[mc].set(
                jnp.where(valid, y, outs[mc]))
            buf = jax.lax.ppermute(y, axis, perm) if n > 1 else y
            return (buf, outs), None

        buf0 = jnp.zeros_like(x_mb[0])
        outs0 = jnp.zeros_like(x_mb)
        (buf, outs), _ = jax.lax.scan(step, (buf0, outs0),
                                      jnp.arange(T))
        # replicate the last stage's outputs to every device
        outs = jax.lax.psum(
            jnp.where(s == n - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    spec_p = jax.tree.map(
        lambda leaf: P(*(axis,) + (None,) * (leaf.ndim - 1)),
        stacked_params)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec_p, P()), out_specs=P(),
                       check_vma=False)
    return fn(stacked_params, x_mb)


def pipeline_apply_circular(mesh: Mesh, layer_fn, stacked_params, x_mb,
                            *, repeats: int, axis: str = "model"):
    """Circular (interleaved) pipeline schedule: each device holds
    ``repeats`` round-robin layer spans instead of one contiguous span,
    so the warm-up/drain bubble amortizes over ``repeats×`` more
    schedule steps.

    Layer assignment (R = ``repeats``, n = stages, L = depth/(R·n)):
    global layers ``(r·n + s)·L .. +L`` run on stage ``s`` as its
    repeat-``r`` span — a microbatch flows around the ring R times
    (``ppermute`` wraps stage n−1 → 0), visiting the devices in order
    ``0..n−1, 0..n−1, ...`` which is exactly the sequential stack.

    Schedule: stage ``s`` at step ``t`` works stream position
    ``u = t − s``, i.e. microbatch ``m = u mod M`` of repeat
    ``r = u ÷ M``; total steps ``T = R·M + n − 1`` vs GPipe's
    ``R·(M + n − 1)`` step-equivalents for the same layer count —
    the bubble fraction drops from ``(n−1)/(M+n−1)`` to
    ``(n−1)/(R·M+n−1)``, at the cost of R× more ppermute hops per
    microbatch (the classic interleaved-schedule trade; profitable
    when activations are small relative to ICI bandwidth).

    Activations that wrap (leave stage n−1 before their last repeat)
    wait in an ``[M, ...]`` buffer until their next-repeat slot comes
    up, which is why ``n_micro ≥ n`` is required (with M < n the wrap
    would arrive after its scheduled re-entry).  ``repeats=1``
    degenerates to :func:`pipeline_apply`'s schedule.  Differentiable
    end-to-end (the repeat-span select is a gather autodiff transposes
    to a scatter-add).
    """
    n = int(mesh.shape[axis])
    R = int(repeats)
    M = x_mb.shape[0]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % (R * n) == 0, (depth, R, n)
    assert M >= n, (f"circular schedule needs n_micro >= stages "
                    f"(got {M} < {n})")
    # [depth, ...] -> [R, n, L, ...]: repeat-major round-robin spans
    grouped = jax.tree.map(
        lambda a: a.reshape((R, n, depth // (R * n)) + a.shape[1:]),
        stacked_params)

    def local(params_local, x_mb):
        s = jax.lax.axis_index(axis)
        # ring WITH wraparound: stage n-1's output lands at stage 0
        perm = [(d, (d + 1) % n) for d in range(n)]
        pl = jax.tree.map(lambda a: a[:, 0], params_local)  # [R, L, ...]

        def span(x, r):
            lp = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, r, 0, keepdims=False), pl)
            def body(h, one):
                return layer_fn(one, h), None
            return jax.lax.scan(body, x, lp)[0]

        T = R * M + n - 1

        def step(carry, t):
            buf, wrap, outs = carry
            u = t - s                       # this stage's stream pos
            uc = jnp.clip(u, 0, R * M - 1)
            r, m = uc // M, uc % M
            # wrapped activations: what stage n-1 computed at t-1
            # arrived in buf via the (n-1 -> 0) edge; park it in its
            # microbatch slot until its next repeat is scheduled
            u_prev = t - 1 - (n - 1)
            upc = jnp.clip(u_prev, 0, R * M - 1)
            wrote = (u_prev >= 0) & (upc // M < R - 1)
            wrap = wrap.at[upc % M].set(
                jnp.where(wrote & (s == 0), buf, wrap[upc % M]))
            # stage 0 input: fresh injection on repeat 0, parked wrap
            # after; other stages take the ring handoff
            x0 = jnp.where(r == 0, x_mb[m], wrap[m])
            x_in = jnp.where(s == 0, x0, buf)
            y = span(x_in, r)
            valid_out = (s == n - 1) & (u >= 0) & (r == R - 1)
            outs = outs.at[m].set(jnp.where(valid_out, y, outs[m]))
            buf = jax.lax.ppermute(y, axis, perm) if n > 1 else y
            return (buf, wrap, outs), None

        buf0 = jnp.zeros_like(x_mb[0])
        carry0 = (buf0, jnp.zeros_like(x_mb), jnp.zeros_like(x_mb))
        (buf, wrap, outs), _ = jax.lax.scan(step, carry0,
                                            jnp.arange(T))
        outs = jax.lax.psum(
            jnp.where(s == n - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    spec_p = jax.tree.map(
        lambda leaf: P(None, axis, *(None,) * (leaf.ndim - 2)), grouped)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec_p, P()), out_specs=P(),
                       check_vma=False)
    return fn(grouped, x_mb)
