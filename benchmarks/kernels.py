"""Kernel microbenchmarks: Pallas vs XLA on MXU-bound shapes.

Run: ``python benchmarks/kernels.py``  (TPU; prints JSON lines)

Measurement methodology (this environment's device proxy makes
``block_until_ready`` unreliable and adds a host round-trip per jit call):
each kernel is iterated inside ONE compiled ``lax.scan`` with a data
dependency between iterations, and the wall time difference between an
n=60 and an n=10 run divides out per-call/transfer constants:

    t_kernel = (t(60 iters) − t(10 iters)) / 50

v5e reference peaks: ~197 TFLOP/s bf16 MXU, ~820 GB/s HBM.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G          # noqa: E402
from taper_tpu.ops.pallas import quant as Q         # noqa: E402
from taper_tpu.ops.pallas import optim_kernels as OK  # noqa: E402
from taper_tpu.ops.pallas import pool as P          # noqa: E402
from taper_tpu.ops import xla as X                  # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from taper_tpu.quantization.qtensor import quantize  # noqa: E402

N_HI, N_LO = 60, 10


def _run(jp, init, n):
    t0 = time.perf_counter()
    out = jp(init, n)
    # force real materialization (block_until_ready is unreliable here)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]))
    return time.perf_counter() - t0


def timeit_scan(step, init):
    """Per-iteration seconds of ``step`` chained inside one scan program."""
    def prog(c, n):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=n)[0]
    jp = jax.jit(prog, static_argnums=(1,))
    _run(jp, init, N_LO)   # compile both lengths
    _run(jp, init, N_HI)
    t_lo = min(_run(jp, init, N_LO) for _ in range(3))
    t_hi = min(_run(jp, init, N_HI) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (N_HI - N_LO)


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
           timeit_scan(lambda c: G.linear(c, b, bias, "none") * 1e-2, a),
           flops)
    G.set_compute_dtype("bfloat16")
    report("pallas_linear_bf16_4096",
           timeit_scan(lambda c: G._gemm(c, b, bias, mode="nt") * 1e-2, a),
           flops)
    G.set_compute_dtype("float32")
    report("xla_linear_f32_4096",
           timeit_scan(lambda c: X.linear(c, b, bias) * 1e-2, a), flops)
    bbf = b.astype(jnp.bfloat16)
    report("xla_linear_bf16w_4096",
           timeit_scan(lambda c: X.linear(c, bbf.astype(jnp.float32),
                                          bias) * 1e-2, a), flops)

    # int8 dequant-on-load vs XLA dequant-then-matmul
    qt = quantize(b, QuantizationConfig.int8())
    report("pallas_q8_linear_4096",
           timeit_scan(lambda c: Q.linear_q8(
               c, qt.values, qt.scale, qt.zero_point, bias) * 1e-2, a),
           flops)

    def xla_deq(c):
        w = ((qt.values.astype(jnp.float32)
              - qt.zero_point.astype(jnp.float32)) * qt.scale)
        return X.linear(c, w, bias) * 1e-2
    report("xla_dequant_linear_4096", timeit_scan(xla_deq, a), flops)

    # pooling (bandwidth-bound; chain adds ~2 elementwise passes)
    xp = jax.random.normal(key, (256, 64, 64, 64))
    gb = xp.size * 4 * 1.25 / 1e9
    report("pallas_maxpool2x2_256x64x64x64",
           timeit_scan(lambda c: c + 1e-9 * jnp.mean(
               P.max_pool2d(c, kernel=2)), xp), None, gb)
    report("xla_maxpool2x2_256x64x64x64",
           timeit_scan(lambda c: c + 1e-9 * jnp.mean(
               X.max_pool2d(c, kernel=2)), xp), None, gb)

    # fused AdamW over a 25M-param vector
    n = 25_000_000
    p0 = jax.random.normal(key, (n,)) * 0.01
    g0 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    mask = jnp.ones(n)
    gb = n * 4 * 7 / 1e9  # read p,g,m,v,mask + write p,m,v

    def pallas_adam(c):
        p, m, v = c
        p, m, v = OK.adam_update_flat(
            p, g0, m, v, mask, jnp.float32(1e-3), jnp.float32(10.0),
            b1=0.9, b2=0.999, eps=1e-8, wd=1e-2, decoupled=True)
        return (p, m, v)
    report("pallas_fused_adamw_25M",
           timeit_scan(pallas_adam, (p0, jnp.zeros(n), jnp.zeros(n))),
           None, gb)

    def xla_adam(c):
        p, m, v = c
        m = 0.9 * m + 0.1 * g0
        v = 0.999 * v + 0.001 * g0 * g0
        step = 1e-3 * jnp.sqrt(1 - 0.999 ** 10.0) / (1 - 0.9 ** 10.0)
        p = jnp.where(mask > 0,
                      p * (1 - 1e-3 * 1e-2) - step * m / (jnp.sqrt(v) + 1e-8),
                      p)
        return (p, m, v)
    report("xla_adamw_25M",
           timeit_scan(xla_adam, (p0, jnp.zeros(n), jnp.zeros(n))),
           None, gb)


if __name__ == "__main__":
    main()
