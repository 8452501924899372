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
