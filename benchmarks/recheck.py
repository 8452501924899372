"""Focused re-measurement: bias vs no-bias GEMM, q8 serve, fused AdamW."""

import sys
import time

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


def _run(jp, init, n, consts=()):
    t0 = time.perf_counter()
    out = jp(init, n, *consts)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]))
    return time.perf_counter() - t0


def timeit_scan(step, init, consts=(), n_hi=60, n_lo=10, reps=3):
    def prog(c, n, *cs):
        return jax.lax.scan(lambda c, _: (step(c, *cs), None), c, None,
                            length=n)[0]
    jp = jax.jit(prog, static_argnums=(1,))
    _run(jp, init, n_lo, consts)
    _run(jp, init, n_hi, consts)
    t_lo = min(_run(jp, init, n_lo, consts) for _ in range(reps))
    t_hi = min(_run(jp, init, n_hi, consts) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.01
    bias = jnp.zeros((N,))
    flops = 2.0 * M * N * K

    t = timeit_scan(lambda c, w: G._gemm(
        c, w, None, has_bias=False, mode="nt") * 1e-2, a, (b,))
    print(f"pallas nobias nt      {flops/t/1e12:7.1f} tflops", flush=True)
    t = timeit_scan(lambda c, w, bb: G.linear(c, w, bb, "none") * 1e-2,
                    a, (b, bias))
    print(f"pallas linear bias    {flops/t/1e12:7.1f} tflops", flush=True)
    t = timeit_scan(lambda c, w, bb: X.linear(c, w, bb) * 1e-2,
                    a, (b, bias))
    print(f"xla linear bias       {flops/t/1e12:7.1f} tflops", flush=True)

    # q8 serve with long chains
    Ms, Ns, Ks = 128, 8192, 8192
    xs = jax.random.normal(key, (Ms, Ks)) * 0.01
    ws = jax.random.normal(jax.random.PRNGKey(3), (Ns, Ks)) * 0.01
    bs = jnp.zeros((Ns,))
    flops_s = 2.0 * Ms * Ns * Ks
    qt = quantize(ws, QuantizationConfig.int8())

    def _chain(y):
        return y[:, :Ks] * 1e-2

    t = timeit_scan(lambda c, qv, sc, zp, bb: _chain(Q.linear_q8(
        c, qv, sc, zp, bb)), xs,
        (qt.values, qt.scale, qt.zero_point, bs), n_hi=200, n_lo=40)
    print(f"pallas q8 serve       {flops_s/t/1e12:7.1f} tflops "
          f"({t*1e6:.0f}us)", flush=True)

    def xla_deq_s(c, qv, sc, zp, bb):
        w = (qv.astype(jnp.float32) - zp.astype(jnp.float32)) * sc
        return _chain(X.linear(c, w, bb))
    t = timeit_scan(xla_deq_s, xs,
                    (qt.values, qt.scale, qt.zero_point, bs),
                    n_hi=200, n_lo=40)
    print(f"xla q8 serve          {flops_s/t/1e12:7.1f} tflops "
          f"({t*1e6:.0f}us)", flush=True)

    # fused adamw
    n = 25_000_000
    p0 = jax.random.normal(key, (n,)) * 0.01
    g0 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    gb = n * 4 * 6 / 1e9

    def pallas_adam(c, g):
        p, m, v = c
        p, m, v = OK.adam_update_flat(
            p, g, m, v, None, jnp.float32(1e-3), jnp.float32(10.0),
            b1=0.9, b2=0.999, eps=1e-8, wd=1e-2, decoupled=True)
        return (p, m, v)
    t = timeit_scan(pallas_adam, (p0, jnp.zeros(n), jnp.zeros(n)), (g0,))
    print(f"pallas fused adamw    {gb/t:7.1f} GB/s", flush=True)

    def xla_adam(c, g):
        p, m, v = c
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        step = 1e-3 * jnp.sqrt(1 - 0.999 ** 10.0) / (1 - 0.9 ** 10.0)
        p = p * (1 - 1e-3 * 1e-2) - step * m / (jnp.sqrt(v) + 1e-8)
        return (p, m, v)
    t = timeit_scan(xla_adam, (p0, jnp.zeros(n), jnp.zeros(n)), (g0,))
    print(f"xla adamw             {gb/t:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
