"""Backward-pass tuning probe for the flash attention kernels.

Races fwd-only, bwd-only (via fwd+bwd minus fwd arithmetic), and XLA
at one shape, printing TFLOP/s so block-size experiments in
attention.py can be judged quickly on the real chip.

Run: python benchmarks/tune_attn_bwd.py [bf16] [S]
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


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    s = next((int(a) for a in sys.argv[1:] if a.isdigit()), 4096)
    b, h, d = 2, 8, 64
    causal = True
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
    # causal fwd flops (bwd does ~2.5x more matmul work at same S^2*D)
    flops = 4.0 * b * h * s * s * d / 2

    def fl_fwd(qc):
        return qc + 0.001 * flash_attention(qc, k, v, causal)

    def fl_step(qc):
        g = jax.grad(lambda a: jnp.sum(
            flash_attention(a, k, v, causal).astype(jnp.float32)))(qc)
        return qc + 0.001 * g.astype(qc.dtype)

    def fl_step_kv(qc):
        gs = jax.grad(lambda a, kk, vv: jnp.sum(
            flash_attention(a, kk, vv, causal).astype(jnp.float32)),
            argnums=(0, 1, 2))(qc, k, v)
        return qc + 0.001 * sum(g.astype(qc.dtype) for g in gs)

    def xla_step(qc):
        g = jax.grad(lambda a: jnp.sum(
            X.attention(a, k, v, causal=causal).astype(jnp.float32)))(qc)
        return qc + 0.001 * g.astype(qc.dtype)

    print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal", flush=True)
    race([
        Contender("flash fwd", fl_fwd, q, (), n_hi=60, n_lo=10),
        Contender("flash fwd+bwd(q)", fl_step, q, (), n_hi=40, n_lo=5),
        Contender("flash fwd+bwd(qkv)", fl_step_kv, q, (), n_hi=40,
                  n_lo=5),
        Contender("xla fwd+bwd(q)", xla_step, q, (), n_hi=40, n_lo=5),
    ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
