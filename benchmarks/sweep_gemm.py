"""Block-size sweep for the Pallas GEMM on the v5e (tuning tool).

Traffic model: per (i,j) output tile the kernel streams a[bm,K] once per
j-strip and b[K,bn] once per i-strip, so HBM bytes ~ MK*(N/bn) + KN*(M/bm);
bigger bm*bn cuts refetch until VMEM (~16MB) runs out.  The kernel
accumulates in the revisited output block, so VMEM holds 2*(a+b) + out.

Run: python benchmarks/sweep_gemm.py [serve]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G      # noqa: E402
from taper_tpu.ops.pallas import quant as Q     # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from taper_tpu.quantization.qtensor import quantize  # noqa: E402


from benchmarks.timing import timeit_scan  # noqa: E402


def sweep_train():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.01
    flops = 2.0 * M * N * K

    for blocks in [(512, 1024, 512), (1024, 1024, 128), (1024, 1024, 256),
                   (1024, 2048, 128), (2048, 1024, 128), (1024, 1024, 512)]:
        G._BLOCK_OVERRIDE["blocks"] = blocks
        try:
            t = timeit_scan(lambda c, w: G._gemm(
                c, w, None, has_bias=False, mode="nt") * 1e-2, a, (b,))
            print(f"nt f32io blocks={blocks}  tflops={flops/t/1e12:7.1f}",
                  flush=True)
        except Exception as e:
            print(f"nt f32io blocks={blocks}  FAIL {type(e).__name__}",
                  flush=True)

    # mixed: activations f32 in HBM (cast in-kernel), weights bf16 in HBM
    bb = b.astype(jnp.bfloat16)
    for blocks in [(1024, 1024, 256), (1024, 1024, 512), (1024, 2048, 256),
                   (2048, 1024, 256), (1024, 2048, 128), (512, 1024, 512),
                   (2048, 2048, 128)]:
        G._BLOCK_OVERRIDE["blocks"] = blocks
        try:
            t = timeit_scan(lambda c, w: G._gemm(
                c, w, None, has_bias=False, mode="nt",
                cdtype="bfloat16") * 1e-2, a, (bb,))
            print(f"nt mixed blocks={blocks}  tflops={flops/t/1e12:7.1f}",
                  flush=True)
        except Exception as e:
            print(f"nt mixed blocks={blocks}  FAIL {type(e).__name__}",
                  flush=True)
    G._BLOCK_OVERRIDE["blocks"] = None


def sweep_serve():
    key = jax.random.PRNGKey(0)
    Ms, Ns, Ks = 128, 8192, 8192
    xs = jax.random.normal(key, (Ms, Ks)) * 0.01
    ws = jax.random.normal(jax.random.PRNGKey(3), (Ns, Ks)) * 0.01
    bs = jnp.zeros((Ns,))
    flops = 2.0 * Ms * Ns * Ks
    qt = quantize(ws, QuantizationConfig.int8())

    def _chain(y):
        return y[:, :Ks] * 1e-2

    for blocks in [(128, 1024, 512), (128, 2048, 512), (128, 4096, 512),
                   (128, 8192, 256), (128, 8192, 512), (128, 2048, 1024),
                   (128, 4096, 1024)]:
        Q._BLOCK_OVERRIDE["blocks"] = blocks
        try:
            t = timeit_scan(lambda c, qv, sc, zp, bb: _chain(Q.linear_q8(
                c, qv, sc, zp, bb)),
                xs, (qt.values, qt.scale, qt.zero_point, bs),
                n_hi=150, n_lo=30, reps=3)
            print(f"q8 serve blocks={blocks}  tflops={flops/t/1e12:7.1f} "
                  f"({t*1e6:.0f}us)", flush=True)
        except Exception as e:
            print(f"q8 serve blocks={blocks}  FAIL {type(e).__name__}",
                  flush=True)
    Q._BLOCK_OVERRIDE["blocks"] = None


if __name__ == "__main__":
    if "serve" in sys.argv:
        sweep_serve()
    else:
        sweep_train()
