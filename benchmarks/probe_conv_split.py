"""Where does the direct conv kernel's time go? Race at conv 32->32 28x28:

  a) full direct kernel (assembly + f32 dot)
  b) assembly-only (patch scratch built, dot replaced by a cheap slice)
  c) dot-only on a pre-materialized HBM patch matrix (f32 and bf16-in)
  d) XLA conv

Run: python benchmarks/probe_conv_split.py
"""

import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import conv_direct as CD  # noqa: E402
from taper_tpu.ops import xla as X                  # noqa: E402
from benchmarks.timing import Contender, race      # noqa: E402

N, C, H, O = 256, 32, 28, 32
KH = KW = 3
HO = WO = H
HP = WP = H + 2
KTOT = KH * KW * C
FLOPS = 2.0 * N * HO * WO * KTOT * O


def _assembly_only_kernel(x_ref, o_ref, p_ref, *, kh, kw, c, ho, wo):
    CD._assemble_patches(x_ref, p_ref, kh=kh, kw=kw, c=c, ho=ho, wo=wo)
    nb = x_ref.shape[0]
    # touch the scratch so it isn't dead-code-eliminated; cheap reduction
    o_ref[:] = p_ref[:].reshape(nb * ho * wo, -1)[:, :o_ref.shape[1]]


def _dot_only_kernel(x_ref, w_ref, o_ref, *, bf16):
    xv = x_ref[:]
    wv = w_ref[:]
    if bf16:
        xv = xv.astype(jnp.bfloat16)
        wv = wv.astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        xv, wv, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def assembly_only(xp):
    nb = CD._pick_nb(N, HO, WO, KTOT, HP, WP, C, O)
    n_pad = -(-N // nb) * nb
    return pl.pallas_call(
        functools.partial(_assembly_only_kernel, kh=KH, kw=KW, c=C,
                          ho=HO, wo=WO),
        grid=(n_pad // nb,),
        in_specs=[pl.BlockSpec((nb, HP, WP, C), lambda g: (g, 0, 0, 0))],
        out_specs=pl.BlockSpec((nb * HO * WO, O), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad * HO * WO, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, HO, WO, KTOT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xp)


@functools.partial(jax.jit, static_argnames=("bf16",))
def dot_only(p, w, *, bf16):
    nb = CD._pick_nb(N, HO, WO, KTOT, HP, WP, C, O)
    rows = nb * HO * WO
    n_pad = -(-N // nb) * nb
    return pl.pallas_call(
        functools.partial(_dot_only_kernel, bf16=bf16),
        grid=(n_pad // nb,),
        in_specs=[
            pl.BlockSpec((rows, KTOT), lambda g: (g, 0)),
            pl.BlockSpec((KTOT, O), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, O), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad * HO * WO, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=int(FLOPS), bytes_accessed=4 * n_pad * HO * WO * KTOT,
            transcendentals=0),
    )(p, w)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, C, H, H), jnp.float32) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(1), (O, C, 3, 3),
                          jnp.float32) * 0.1
    b = jnp.zeros((O,))
    xn = jnp.pad(x.transpose(0, 2, 3, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = jnp.asarray(CD._flatten_w(w))
    pm = jax.random.normal(key, (N * HO * WO, KTOT), jnp.float32)

    def full_step(xc, wc, bc):
        y = CD.conv2d_direct(xc, wc, bc, (1, 1), "relu")
        return xc * 0.999 + 0.001 * jnp.mean(y)

    def asm_step(xc):
        y = assembly_only(xc)
        return xc * 0.999 + 0.001 * jnp.mean(y)

    def dot_step_f32(pc, wc):
        y = dot_only(pc, wc, bf16=False)
        return pc * 0.999 + 0.001 * jnp.mean(y)

    def dot_step_bf16(pc, wc):
        y = dot_only(pc, wc, bf16=True)
        return pc * 0.999 + 0.001 * jnp.mean(y)

    def xla_step(xc, wc, bc):
        y = X.conv2d(xc, wc, bc, stride=(1, 1), padding=(1, 1),
                     activation=lambda v: jnp.maximum(v, 0.0))
        return xc * 0.999 + 0.001 * jnp.mean(y)

    race([
        Contender("xla conv", xla_step, x, (w, b), n_hi=100, n_lo=10),
        Contender("full direct", full_step, x, (w, b), n_hi=100, n_lo=10),
        Contender("assembly only", asm_step, xn, (), n_hi=100, n_lo=10),
        Contender("dot only f32", dot_step_f32, pm, (wf,), n_hi=100,
                  n_lo=10),
        Contender("dot only bf16-in", dot_step_bf16, pm, (wf,), n_hi=100,
                  n_lo=10),
    ], rounds=3, scale=FLOPS / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
