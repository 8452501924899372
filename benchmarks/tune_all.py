"""Interleaved A/B kernel tuning on the v5e.

Device throughput drifts ±20% between processes/minutes here, so contenders
are measured ALTERNATING within one process and compared by their best
per-iteration time; the scan-difference methodology (see kernels.py) still
cancels per-call host-tunnel constants.

Run: python benchmarks/tune_all.py [gemm|q8|adam]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G      # noqa: E402
from taper_tpu.ops.pallas import quant as Q     # noqa: E402
from taper_tpu.ops.pallas import optim_kernels as OK  # noqa: E402
from taper_tpu.ops import xla as X              # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from taper_tpu.quantization.qtensor import quantize  # noqa: E402


from benchmarks.timing import Contender, race  # noqa: E402


def gemm():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.01
    bias = jnp.zeros((N,))
    flops = 2.0 * M * N * K

    def pallas_blocks(blocks, has_bias):
        def step(c, w, bb):
            G._BLOCK_OVERRIDE["blocks"] = blocks
            try:
                if has_bias:
                    return G._gemm(c, w, bb, epilogue="none",
                                   has_bias=True, mode="nt") * 1e-2
                return G._gemm(c, w, None, has_bias=False,
                               mode="nt") * 1e-2
            finally:
                G._BLOCK_OVERRIDE["blocks"] = None
        return step

    cs = [
        Contender("xla linear bias", lambda c, w, bb: X.linear(
            c, w, bb) * 1e-2, a, (b, bias)),
        Contender("pallas (1024,1024,256) bias",
                  pallas_blocks((1024, 1024, 256), True), a, (b, bias)),
        Contender("pallas (1024,1024,256) nobias",
                  pallas_blocks((1024, 1024, 256), False), a, (b, bias)),
        Contender("pallas (512,1024,512) bias",
                  pallas_blocks((512, 1024, 512), True), a, (b, bias)),
        Contender("pallas (1024,1024,512) bias",
                  pallas_blocks((1024, 1024, 512), True), a, (b, bias)),
        Contender("pallas (1024,1024,128) bias",
                  pallas_blocks((1024, 1024, 128), True), a, (b, bias)),
    ]
    race(cs, scale=flops / 1e12, unit="tflops")


def q8():
    key = jax.random.PRNGKey(0)
    Ms, Ns, Ks = 128, 8192, 8192
    xs = jax.random.normal(key, (Ms, Ks)) * 0.01
    ws = jax.random.normal(jax.random.PRNGKey(3), (Ns, Ks)) * 0.01
    bs = jnp.zeros((Ns,))
    flops = 2.0 * Ms * Ns * Ks
    qt = quantize(ws, QuantizationConfig.int8())

    def _chain(y):
        return y[:, :Ks] * 1e-2

    def pallas_blocks(blocks):
        def step(c, qv, sc, zp, bb):
            Q._BLOCK_OVERRIDE["blocks"] = blocks
            try:
                return _chain(Q.linear_q8(c, qv, sc, zp, bb))
            finally:
                Q._BLOCK_OVERRIDE["blocks"] = None
        return step

    def xla_deq(c, qv, sc, zp, bb):
        w = (qv.astype(jnp.float32) - zp.astype(jnp.float32)) * sc
        return _chain(X.linear(c, w, bb))

    consts = (qt.values, qt.scale, qt.zero_point, bs)
    cs = [
        Contender("xla fused dequant serve", xla_deq, xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,8192,256)",
                  pallas_blocks((128, 8192, 256)), xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,8192,128)",
                  pallas_blocks((128, 8192, 128)), xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,4096,256)",
                  pallas_blocks((128, 4096, 256)), xs, consts,
                  n_hi=200, n_lo=40),
    ]
    race(cs, scale=flops / 1e12, unit="tflops")


def adam():
    key = jax.random.PRNGKey(0)
    n = 25_000_000
    p0 = jax.random.normal(key, (n,)) * 0.01
    g0 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    gb = n * 4 * 6 / 1e9
    init = (p0, jnp.zeros(n), jnp.zeros(n))

    def pallas_rows(rows, sem):
        def step(c, g):
            old_r, old_s = OK._BLOCK_ROWS, OK._SEMANTICS
            OK._BLOCK_ROWS, OK._SEMANTICS = rows, sem
            try:
                p, m, v = c
                return OK.adam_update_flat(
                    p, g, m, v, None, jnp.float32(1e-3), jnp.float32(10.0),
                    b1=0.9, b2=0.999, eps=1e-8, wd=1e-2, decoupled=True)
            finally:
                OK._BLOCK_ROWS, OK._SEMANTICS = old_r, old_s
        return step

    def xla_adam(c, g):
        p, m, v = c
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        step = 1e-3 * jnp.sqrt(1 - 0.999 ** 10.0) / (1 - 0.9 ** 10.0)
        p = p * (1 - 1e-3 * 1e-2) - step * m / (jnp.sqrt(v) + 1e-8)
        return (p, m, v)

    cs = [Contender("xla adamw (default path)", xla_adam, init, (g0,)),
          Contender("pallas flat rows=2048", pallas_rows(2048, "arbitrary"),
                    init, (g0,)),
          Contender("pallas flat rows=1024", pallas_rows(1024, "arbitrary"),
                    init, (g0,))]
    race(cs, scale=gb, unit="GB/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gemm"
    {"gemm": gemm, "q8": q8, "adam": adam}[which]()
