"""Flash attention vs XLA attention on the v5e (interleaved races).

Three rows per shape: forward-only, and a full fwd+bwd step (grad wrt
q/k/v).  XLA materializes the [B,H,S,S] score matrix in HBM, so its time
scales O(S^2) in memory traffic; the flash kernel is O(S*D).

Run: python benchmarks/bench_attention.py [bf16]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops import xla as X                        # noqa: E402
from taper_tpu.ops.pallas.attention import flash_attention  # noqa: E402
from benchmarks.timing import Contender, race            # noqa: E402


SHAPES = [
    # (B, H, S, D)
    (4, 8, 512, 64),
    (4, 8, 1024, 64),
    (4, 8, 2048, 64),
    (2, 8, 4096, 64),
    (2, 8, 2048, 128),
]


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    causal = True
    for b, h, s, d in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
        # causal: half the S^2 work
        flops = 4.0 * b * h * s * s * d / 2

        def xla_fwd(qc, kc, vc):
            y = X.attention(qc, kc, vc, causal=causal)
            return qc + 0.001 * y

        def fl_fwd(qc, kc, vc):
            y = flash_attention(qc, kc, vc, causal)
            return qc + 0.001 * y

        def xla_step(qc, kc, vc):
            g = jax.grad(lambda a: jnp.sum(
                X.attention(a, kc, vc, causal=causal)
                .astype(jnp.float32)))(qc)
            return qc + 0.001 * g.astype(qc.dtype)

        def fl_step(qc, kc, vc):
            g = jax.grad(lambda a: jnp.sum(
                flash_attention(a, kc, vc, causal)
                .astype(jnp.float32)))(qc)
            return qc + 0.001 * g.astype(qc.dtype)

        err = float(jnp.max(jnp.abs(
            (X.attention(q, k, v, causal=causal)
             - flash_attention(q, k, v, causal)).astype(jnp.float32))))
        print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal "
              f"(maxerr {err:.1e})", flush=True)
        race([
            Contender("xla fwd", xla_fwd, q, (k, v), n_hi=60, n_lo=10),
            Contender("flash fwd", fl_fwd, q, (k, v), n_hi=60, n_lo=10),
            Contender("xla fwd+bwd", xla_step, q, (k, v), n_hi=60,
                      n_lo=10),
            Contender("flash fwd+bwd", fl_step, q, (k, v), n_hi=60,
                      n_lo=10),
        ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
