"""Prototype race: tap-decomposition Pallas conv vs direct (patch-scratch)
kernel vs XLA's native conv emitter, at the MNIST-CNN shapes.

Hypothesis: the direct kernel's bottleneck is the LANE-relayout copies that
assemble the [.., C*kh*kw] patch scratch when C < 128.  A tap decomposition
never moves lanes: y += dot(x[:, i:i+ho, j:j+wo, :].reshape(R, C), W[tap])
slices sublanes only, so the kh*kw copies are cheap sublane gathers, at the
cost of kh*kw smaller-K MXU dots.  For C == 1 (the stem), skip the MXU and
do kh*kw VPU broadcast-FMAs accumulated in the output block.

Run: python benchmarks/proto_conv_taps.py
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


def _epi(y, b, epilogue):
    if b is not None:
        y = y + b
    if epilogue == "relu":
        y = jnp.maximum(y, 0.0)
    elif epilogue == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y


def _tap_kernel_mxu(x_ref, w_ref, b_ref, o_ref, *, kh, kw, c, ho, wo,
                    epilogue):
    nb = x_ref.shape[0]
    rows = nb * ho * wo
    y = None
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            xt = x_ref[:, i:i + ho, j:j + wo, :].reshape(rows, c)
            contrib = jax.lax.dot_general(
                xt, w_ref[t * c:(t + 1) * c, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = contrib if y is None else y + contrib
    o_ref[:] = _epi(y, b_ref[:], epilogue).astype(o_ref.dtype)


def _tap_kernel_vpu(x_ref, w_ref, b_ref, o_ref, *, kh, kw, c, ho, wo,
                    epilogue):
    # C tiny: kh*kw*c broadcast-FMAs on the VPU, accumulated in the output
    # block (4D [nb, ho, wo, o]) to bound live VMEM.
    for i in range(kh):
        for j in range(kw):
            for cc in range(c):
                xt = x_ref[:, i:i + ho, j:j + wo, cc]
                t = (i * kw + j) * c + cc
                contrib = xt[..., None] * w_ref[t, :]
                if t == 0:
                    o_ref[:] = contrib
                else:
                    o_ref[:] += contrib
    o_ref[:] = _epi(o_ref[:], b_ref[:], epilogue).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "padding",
                                             "epilogue"))
def conv_taps_fwd(x, w_flat, b, *, kh, kw, padding, epilogue="none"):
    """x: [N,H,W,C] f32, w_flat: [kh*kw*C, O] tap-major."""
    n, h, wdim, c = x.shape
    ph, pw = padding
    o = w_flat.shape[1]
    ho = h + 2 * ph - kh + 1
    wo = wdim + 2 * pw - kw + 1

    nb = CD._pick_nb(n, ho, wo, kh * kw * c, h + 2 * ph, wdim + 2 * pw,
                     c, o)
    if c < 8:
        nb = min(nb, 4)
    n_pad = -(-n // nb) * nb
    pads = ((0, n_pad - n), (ph, ph), (pw, pw), (0, 0))
    xp = jnp.pad(x, pads) if any(p != (0, 0) for p in pads) else x
    hp, wp = h + 2 * ph, wdim + 2 * pw
    vpu = c < 8

    common = dict(kh=kh, kw=kw, c=c, ho=ho, wo=wo, epilogue=epilogue)
    if vpu:
        kernel = functools.partial(_tap_kernel_vpu, **common)
        out_specs = pl.BlockSpec((nb, ho, wo, o), lambda g: (g, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((n_pad, ho, wo, o), jnp.float32)
    else:
        kernel = functools.partial(_tap_kernel_mxu, **common)
        out_specs = pl.BlockSpec((nb * ho * wo, o), lambda g: (g, 0))
        out_shape = jax.ShapeDtypeStruct((n_pad * ho * wo, o), jnp.float32)

    y = pl.pallas_call(
        kernel,
        grid=(n_pad // nb,),
        in_specs=[
            pl.BlockSpec((nb, hp, wp, c), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((kh * kw * c, o), lambda g: (0, 0)),
            pl.BlockSpec((1, o), lambda g: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * ho * wo * kh * kw * c * o,
            bytes_accessed=4 * (n_pad * hp * wp * c + kh * kw * c * o
                                + n_pad * ho * wo * o),
            transcendentals=0),
        interpret=False,
    )(xp, w_flat, b.reshape(1, o))
    return y.reshape(n_pad, ho, wo, o)[:n]


SHAPES = [
    # (name, N, C, H, O)  all 3x3 pad 1 stride 1 (MNIST CNN + CIFAR ResNet)
    ("stem 1->32 28x28", 256, 1, 28, 32),
    ("conv 32->32 28x28", 256, 32, 28, 32),
    ("conv 32->64 14x14", 256, 32, 14, 64),
    ("conv 64->64 14x14", 256, 64, 14, 64),
    ("conv 64->128 7x7", 256, 64, 7, 128),
    ("cifar 16->16 32x32", 256, 16, 32, 16),
    ("cifar 64->64 8x8", 256, 64, 8, 64),
]


def main():
    for name, n, c, h, o in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, c, h, h), jnp.float32) * 0.1
        w = jax.random.normal(jax.random.PRNGKey(1), (o, c, 3, 3),
                              jnp.float32) * 0.1
        b = jnp.zeros((o,))
        xn = jnp.asarray(x.transpose(0, 2, 3, 1))
        wf = jnp.asarray(CD._flatten_w(w))

        # correctness
        ref = X.conv2d(x, w, b, stride=(1, 1), padding=(1, 1),
                       activation=lambda v: jnp.maximum(v, 0.0))
        got = conv_taps_fwd(xn, wf, b, kh=3, kw=3, padding=(1, 1),
                            epilogue="relu").transpose(0, 3, 1, 2)
        err = float(jnp.max(jnp.abs(ref - got)))
        # XLA's conv (and MXU dots) compute via bf16 passes (~6e-4 abs at
        # these scales); the VPU tap path is exact f32 — verified vs a
        # float64 NumPy conv (taps 2.5e-8, xla/direct 6e-4).
        assert err < 5e-3, (name, err)

        flops = 2.0 * n * h * h * 9 * c * o

        def xla_step(xc, wc, bc):
            y = X.conv2d(xc, wc, bc, stride=(1, 1), padding=(1, 1),
                         activation=lambda v: jnp.maximum(v, 0.0))
            return xc * 0.999 + 0.001 * jnp.mean(y)

        def direct_step(xc, wc, bc):
            y = CD.conv2d_direct(xc, wc, bc, (1, 1), "relu")
            return xc * 0.999 + 0.001 * jnp.mean(y)

        def taps_step(xc, wfc, bc):
            y = conv_taps_fwd(xc, wfc, bc, kh=3, kw=3, padding=(1, 1),
                              epilogue="relu")
            return xc * 0.999 + 0.001 * jnp.mean(y)

        print(f"{name}  (maxerr {err:.1e})", flush=True)
        race([
            Contender("xla conv", xla_step, x, (w, b), n_hi=100, n_lo=10),
            Contender("direct (patch scratch)", direct_step, x, (w, b),
                      n_hi=100, n_lo=10),
            Contender("taps", taps_step, xn, (wf, b), n_hi=100, n_lo=10),
        ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
