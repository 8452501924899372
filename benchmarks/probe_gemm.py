"""One-off probe: XLA matmul precision modes vs Pallas GEMM on the v5e.

Answers two tuning questions:
  1. What does XLA's *default* f32 matmul actually compute (bf16 single
     pass? bf16x3? true f32), judged by error vs a float64 reference?
  2. Where does the Pallas kernel stand at matched numerics?

Run: python benchmarks/probe_gemm.py   (TPU; one process at a time)
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G  # noqa: E402

from benchmarks.timing import timeit_scan  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 0.01
    flops = 2.0 * M * N * K

    # numerics: error vs float64 on a 512-slice
    a64 = np.asarray(a[:256], np.float64)
    b64 = np.asarray(b[:, :256], np.float64)
    ref = a64 @ b64

    def err(y):
        y = np.asarray(y[:256, :256], np.float64)
        return float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))

    for prec in ("default", "float32", "bfloat16", "bfloat16_3x"):
        try:
            f = jax.jit(lambda x, y, p=prec: jnp.matmul(
                x, y, precision=p, preferred_element_type=jnp.float32))
            y = f(a, b)
            t = timeit_scan(lambda c, w, p=prec: jnp.matmul(
                c, w, precision=p,
                preferred_element_type=jnp.float32) * 1e-2, a, (b,))
            print(f"xla precision={prec:12s} err={err(y):.2e} "
                  f"tflops={flops/t/1e12:7.1f}", flush=True)
        except Exception as e:
            print(f"xla precision={prec}: {type(e).__name__} {e}")

    # bf16-input matmul
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    f = jax.jit(lambda x, y: jnp.matmul(
        x, y, preferred_element_type=jnp.float32))
    y = f(ab, bb)
    t = timeit_scan(lambda c, w: jnp.matmul(
        c, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        * 1e-2, ab, (bb,))
    print(f"xla bf16-inputs          err={err(y):.2e} "
          f"tflops={flops/t/1e12:7.1f}", flush=True)

    # pallas kernel, both compute dtypes (b is [K,N] -> mode nn)
    for cd in ("float32", "bfloat16"):
        y = G._gemm(a, b, None, has_bias=False, mode="nn", cdtype=cd)
        t = timeit_scan(lambda c, w, cd=cd: G._gemm(
            c, w, None, has_bias=False, mode="nn", cdtype=cd) * 1e-2,
            a, (b,))
        print(f"pallas cdtype={cd:10s}   err={err(y):.2e} "
              f"tflops={flops/t/1e12:7.1f}", flush=True)


if __name__ == "__main__":
    main()
