"""Prototype: CHWN-layout tap-decomposition conv.

Layout CHWN puts the BATCH on lanes (128-aligned by blocking), so per-tap
slices move only sublanes/major dims and the contraction (over C) uses
Mosaic's multi-dim dot_general — no patch materialization, no lane
relayout.  The MXU still pads K=C<128, so the ceiling is C/128 of peak;
the question is whether that beats the relayout-bound direct kernel.

Run: python benchmarks/proto_conv_chwn.py
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


def _kernel(x_ref, w_ref, b_ref, o_ref, *, kh, kw, hb, wo, epilogue):
    y = None
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            xt = x_ref[0, :, i:i + hb, j:j + wo, :]
            contrib = jax.lax.dot_general(
                w_ref[t], xt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = contrib if y is None else y + contrib
    y = y + b_ref[:]
    if epilogue == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[:] = y


@functools.partial(jax.jit, static_argnames=("kh", "kw", "padding",
                                             "epilogue"))
def conv_chwn(x, w_taps, bias, *, kh, kw, padding, epilogue="relu"):
    """x: [C, H, W, N] f32; w_taps: [kh*kw, O, C]; returns [O, H, W, N]."""
    c, h, wdim, n = x.shape
    ph, pw = padding
    o = w_taps.shape[1]
    ho = h + 2 * ph - kh + 1
    wo = wdim + 2 * pw - kw + 1
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    hp, wp = h + 2 * ph, wdim + 2 * pw

    nb = 128 if n % 128 == 0 else n
    # block height to stay in VMEM
    hb = ho
    while (c * (hb + kh - 1) * wp + o * hb * wo) * nb * 4 > 3 * 2 ** 20:
        hb //= 2
    hb = max(hb, 1)
    n_h = -(-ho // hb)
    # overlapping h-bands (halo = kh-1 rows) are not expressible as
    # blocked indexing; materialize the bands once (1.07x input copy,
    # fused with the pad by XLA)
    xb = jnp.stack([xp[:, i * hb:i * hb + hb + kh - 1]
                    for i in range(n_h)])

    y = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, hb=hb, wo=wo,
                          epilogue=epilogue),
        grid=(n // nb, n_h),
        in_specs=[
            pl.BlockSpec((1, c, hb + kh - 1, wp, nb),
                         lambda gn, gh: (gh, 0, 0, 0, gn)),
            pl.BlockSpec((kh * kw, o, c), lambda gn, gh: (0, 0, 0)),
            pl.BlockSpec((o, 1, 1, 1), lambda gn, gh: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((o, hb, wo, nb),
                               lambda gn, gh: (0, gh, 0, gn)),
        out_shape=jax.ShapeDtypeStruct((o, n_h * hb, wo, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * kh * kw * c * o,
            bytes_accessed=4 * (n * hp * wp * c + kh * kw * c * o
                                + n * ho * wo * o),
            transcendentals=0),
        interpret=False,
    )(xb, w_taps, bias.reshape(o, 1, 1, 1))
    return y[:, :ho]


SHAPES = [
    ("conv 32->32 28x28", 256, 32, 28, 32),
    ("conv 64->64 14x14", 256, 64, 14, 64),
    ("cifar 16->16 32x32", 256, 16, 32, 16),
]


def main():
    for name, n, c, h, o in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, c, h, h), jnp.float32) * 0.1
        w = jax.random.normal(jax.random.PRNGKey(1), (o, c, 3, 3),
                              jnp.float32) * 0.1
        b = jnp.zeros((o,))
        xc = jnp.asarray(x.transpose(1, 2, 3, 0))        # CHWN
        wt = jnp.asarray(w.transpose(2, 3, 0, 1).reshape(9, o, c))

        ref = X.conv2d(x, w, b, stride=(1, 1), padding=(1, 1),
                       activation=lambda v: jnp.maximum(v, 0.0))
        got = conv_chwn(xc, wt, b, kh=3, kw=3, padding=(1, 1))
        got_nchw = got.transpose(3, 0, 1, 2)
        err = float(jnp.max(jnp.abs(ref - got_nchw)))
        print(f"{name} maxerr {err:.1e}", flush=True)
        assert err < 5e-3, err

        flops = 2.0 * n * h * h * 9 * c * o

        def xla_step(xn, wn, bn):
            y = X.conv2d(xn, wn, bn, stride=(1, 1), padding=(1, 1),
                         activation=lambda v: jnp.maximum(v, 0.0))
            return xn * 0.999 + 0.001 * jnp.mean(y)

        def direct_step(xn, wn, bn):
            y = CD.conv2d_direct(xn, wn, bn, (1, 1), "relu")
            return xn * 0.999 + 0.001 * jnp.mean(y)

        def chwn_step(xcc, wtc, bc):
            y = conv_chwn(xcc, wtc, bc, kh=3, kw=3, padding=(1, 1))
            return xcc * 0.999 + 0.001 * jnp.mean(y)

        race([
            Contender("xla conv", xla_step, x, (w, b), n_hi=100, n_lo=10),
            Contender("direct (patch)", direct_step, x, (w, b),
                      n_hi=100, n_lo=10),
            Contender("chwn taps", chwn_step, xc, (wt, b), n_hi=100,
                      n_lo=10),
        ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
