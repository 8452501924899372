"""Kernel microbenchmarks: Pallas vs XLA on MXU/VPU-bound shapes.

Run: ``python benchmarks/kernels.py``  (TPU; prints JSON lines)

Measurement methodology (this environment's device proxy makes
``block_until_ready`` unreliable and adds a host round-trip per jit call):
each kernel is iterated inside ONE compiled ``lax.scan`` with a data
dependency between iterations, and the wall time difference between a long
and a short run divides out per-call/transfer constants:

    t_kernel = (t(n_hi iters) − t(n_lo iters)) / (n_hi − n_lo)

Fast kernels use longer chains so the difference clears the tunnel's noise
floor.  Device throughput drifts ±15% between processes — treat absolute
numbers accordingly; benchmarks/tune_all.py runs interleaved A/B races for
tuning decisions.

v5e reference peaks: ~197 TFLOP/s bf16 MXU; HBM streams measured up to
~1 TB/s effective through XLA fusions.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G          # noqa: E402
from taper_tpu.ops.pallas import quant as Q         # noqa: E402
from taper_tpu.ops.pallas import optim_kernels as OK  # noqa: E402
from taper_tpu.ops.pallas import pool as P          # noqa: E402
from taper_tpu.ops.pallas.conv_direct import conv2d_direct  # noqa: E402
from taper_tpu.ops import xla as X                  # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from taper_tpu.quantization.qtensor import quantize  # noqa: E402


from benchmarks.timing import timeit_scan  # noqa: E402


def report(name, secs, flops=None, gbytes=None):
    entry = {"kernel": name, "ms": round(secs * 1e3, 4)}
    if flops:
        entry["tflops"] = round(flops / secs / 1e12, 1)
    if gbytes:
        entry["GB/s"] = round(gbytes / secs, 1)
    print(json.dumps(entry), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.01
    bias = jnp.zeros((N,))
    flops = 2.0 * M * N * K

    report("pallas_linear_f32_4096",
           timeit_scan(lambda c, w, bb: G.linear(c, w, bb, "none") * 1e-2,
                       a, (b, bias)), flops)
    G.set_compute_dtype("bfloat16")
    report("pallas_linear_bf16_4096",
           timeit_scan(lambda c, w, bb: G._gemm(c, w, bb, mode="nt") * 1e-2,
                       a, (b, bias)), flops)
    G.set_compute_dtype("float32")
    report("xla_linear_f32_4096",
           timeit_scan(lambda c, w, bb: X.linear(c, w, bb) * 1e-2,
                       a, (b, bias)), flops)

    # int8 dequant-on-load vs XLA dequant-then-matmul
    qt = quantize(b, QuantizationConfig.int8())
    report("pallas_q8_linear_4096",
           timeit_scan(lambda c, qv, qs, qz, bb: Q.linear_q8(
               c, qv, qs, qz, bb) * 1e-2,
               a, (qt.values, qt.scale, qt.zero_point, bias)), flops)

    def xla_deq(c, qv, qs, qz, bb):
        w = (qv.astype(jnp.float32) - qz.astype(jnp.float32)) * qs
        return X.linear(c, w, bb) * 1e-2
    report("xla_dequant_linear_4096",
           timeit_scan(xla_deq, a,
                       (qt.values, qt.scale, qt.zero_point, bias)), flops)

    # Serving shape: skinny batch, fat weights — weight-bandwidth-bound,
    # where int8 dequant-on-load reads 4x fewer bytes than f32.  Long
    # chains: at ~100us/iter short chains sink below the tunnel noise.
    Ms, Ns, Ks = 128, 8192, 8192
    xs = jax.random.normal(key, (Ms, Ks)) * 0.01
    ws = jax.random.normal(jax.random.PRNGKey(3), (Ns, Ks)) * 0.01
    bs = jnp.zeros((Ns,))
    flops_s = 2.0 * Ms * Ns * Ks
    qs = quantize(ws, QuantizationConfig.int8())

    def _chain(y):  # [Ms, Ns] -> [Ms, Ks] to keep the scan dependency
        return y[:, :Ks] * 1e-2

    report("xla_linear_f32_serve_128x8192",
           timeit_scan(lambda c, w, bb: _chain(X.linear(c, w, bb)),
                       xs, (ws, bs), n_hi=200, n_lo=40), flops_s)
    report("pallas_q8_linear_serve_128x8192",
           timeit_scan(lambda c, qv, sc, zp, bb: _chain(Q.linear_q8(
               c, qv, sc, zp, bb)),
               xs, (qs.values, qs.scale, qs.zero_point, bs),
               n_hi=200, n_lo=40), flops_s)

    def xla_deq_s(c, qv, sc, zp, bb):
        w = (qv.astype(jnp.float32) - zp.astype(jnp.float32)) * sc
        return _chain(X.linear(c, w, bb))
    report("xla_dequant_linear_serve_128x8192",
           timeit_scan(xla_deq_s, xs,
                       (qs.values, qs.scale, qs.zero_point, bs),
                       n_hi=200, n_lo=40), flops_s)

    # int4: packed nibbles unpacked in-kernel (half int8's weight bytes)
    q4s = quantize(ws, QuantizationConfig.int4())
    report("pallas_q4_linear_serve_128x8192",
           timeit_scan(lambda c, qv, sc, zp, bb: _chain(Q.linear_q4(
               c, qv, sc, zp, bb, n_features=Ks)),
               xs, (q4s.values, q4s.scale, q4s.zero_point, bs),
               n_hi=200, n_lo=40), flops_s)

    # conv: direct (implicit-im2col) Pallas kernel vs XLA's native conv
    # emitter at the MNIST-CNN hot shape (batch 256, 32ch 3x3 same).
    xc = jax.random.normal(key, (256, 32, 28, 28)) * 0.1
    wc = jax.random.normal(jax.random.PRNGKey(4), (32, 32, 3, 3)) * 0.1
    bc = jnp.zeros((32,))
    gb_c = 2 * xc.size * 4 / 1e9
    report("xla_conv3x3_256x32x28x28",
           timeit_scan(lambda c, w, bb: X.conv2d(
               c, w, bb, stride=(1, 1), padding=(1, 1),
               activation=X.relu) * 1e-1, xc, (wc, bc),
               n_hi=200, n_lo=40), None, gb_c)
    report("pallas_direct_conv3x3_256x32x28x28",
           timeit_scan(lambda c, w, bb: conv2d_direct(
               c, w, bb, (1, 1), "relu") * 1e-1, xc, (wc, bc)),
           None, gb_c)

    # pooling: the dispatched op (XLA by default — measured policy) and
    # the shift-select Pallas kernel as a formulation study.
    xp = jax.random.normal(key, (256, 64, 28, 28))
    gb = xp.size * 4 * 1.25 / 1e9
    report("xla_maxpool2x2_256x64x28x28",
           timeit_scan(lambda c: c + 1e-9 * jnp.mean(
               X.max_pool2d(c, kernel=2)), xp, n_hi=200, n_lo=40),
           None, gb)
    report("pallas_maxpool_kernel_study_256x64x28x28",
           timeit_scan(lambda c: c + 1e-9 * jnp.mean(
               P._max_pool_p(c, 2, 2)), xp), None, gb)

    # optimizer update over a 25M-param vector: XLA per-leaf tree fusion is
    # the DEFAULT path (measured dispatch); the flat fused Pallas kernel
    # (TAPER_FUSED_OPT=1) pays ravel/pad/unravel copies around it.
    n = 25_000_000
    p0 = jax.random.normal(key, (n,)) * 0.01
    g0 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01

    gb = n * 4 * 6 / 1e9  # read p,g,m,v + write p,m,v

    def xla_adam(c, g):
        p, m, v = c
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        step = 1e-3 * jnp.sqrt(1 - 0.999 ** 10.0) / (1 - 0.9 ** 10.0)
        p = p * (1 - 1e-3 * 1e-2) - step * m / (jnp.sqrt(v) + 1e-8)
        return (p, m, v)
    report("xla_adamw_25M_default",
           timeit_scan(xla_adam, (p0, jnp.zeros(n), jnp.zeros(n)),
                       (g0,)), None, gb)

    def pallas_adam(c, g):
        p, m, v = c
        p, m, v = OK.adam_update_flat(
            p, g, m, v, None, jnp.float32(1e-3), jnp.float32(10.0),
            b1=0.9, b2=0.999, eps=1e-8, wd=1e-2, decoupled=True)
        return (p, m, v)
    report("pallas_fused_adamw_25M_optin",
           timeit_scan(pallas_adam, (p0, jnp.zeros(n), jnp.zeros(n)),
                       (g0,)), None, gb)


if __name__ == "__main__":
    main()
