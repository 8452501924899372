"""Direct Pallas conv vs XLA's emitter at lane-aligned channel counts.

conv_direct.py's trilemma analysis says the patch-assembly relayout
collapses when C fills the 128 lanes; this probe races the two at
C in {32, 64, 128, 256} to set the dispatch rule (VERDICT r2 item 2).

Measured (v5e, f32, n_hi=400 chains — short chains under-resolve the
fast rows): the relayout collapse is REAL (direct recovers from 2.6 to
55-80 TFLOP/s at C 128/256) but XLA's emitter still wins everywhere:
C=128 14x14: 67us vs 17us; C=256 7x7: 47 vs 18; C=128 28x28 N16: 64 vs
11.  Hence the default dispatch routes ALL stride-1 small-K convs to
the emitter (conv.py), and TAPER_CONV=direct is the all-kernels opt-in.

Run: python benchmarks/probe_conv_c128.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops import xla as X                       # noqa: E402
from taper_tpu.ops.pallas.conv_direct import conv2d_direct  # noqa: E402
from benchmarks.timing import Contender, race            # noqa: E402


SHAPES = [
    # (N, C, H, W, O)  3x3 stride-1 pad-1
    (64, 32, 28, 28, 32),
    (64, 64, 14, 14, 64),
    (64, 128, 14, 14, 128),
    (64, 256, 7, 7, 256),
    (16, 128, 28, 28, 128),
]


def main():
    for n, c, h, w, o in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c, h, w))
        wt = jax.random.normal(jax.random.PRNGKey(1), (o, c, 3, 3)) * 0.05
        b = jnp.zeros((o,))
        flops = 2.0 * n * h * w * c * 9 * o

        def direct(xc, wc):
            return xc + 0.001 * conv2d_direct(xc, wc, b, (1, 1), "none")

        def xla(xc, wc):
            return xc + 0.001 * X.conv2d(xc, wc, b, stride=(1, 1),
                                         padding=(1, 1))

        err = float(jnp.max(jnp.abs(
            conv2d_direct(x, wt, b, (1, 1), "none")
            - X.conv2d(x, wt, b, stride=(1, 1), padding=(1, 1)))))
        print(f"N{n} C{c} {h}x{w} O{o} 3x3 (maxerr {err:.1e})",
              flush=True)
        race([
            Contender("direct", direct, x, (wt,), n_hi=60, n_lo=10),
            Contender("xla", xla, x, (wt,), n_hi=60, n_lo=10),
        ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
