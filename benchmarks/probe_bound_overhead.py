"""Probe: where does the integrated bound-max dispatch overhead go?

Compares, at identical shapes (B4 H8 S4096 D64 bf16 causal):
  1. production flash_attention (cond-dispatched bound-max)
  2. production with TAPER_ATTN_BOUNDMAX=0 (exact-max kernel)
  3. the raw prototype bound kernel (no cond, no norm precompute)
  4. prototype + norm precompute but NO cond (norm cost alone)

Run: python benchmarks/probe_bound_overhead.py
"""

import sys

sys.path.insert(0, ".")

import os

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.proto_attn_boundmax import flash_fwd_bound  # noqa: E402
from benchmarks.timing import Contender, race  # noqa: E402
from taper_tpu.ops.pallas.attention import flash_attention  # noqa: E402


def main():
    b, h, s, d = 4, 8, 4096, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
               for kk in ks)
    f4 = 4 * b * h * s * s * d / 2

    def prod_on(qc):
        os.environ["TAPER_ATTN_BOUNDMAX"] = "1"
        return qc + 0.001 * flash_attention(qc, k, v, True)

    def prod_off(qc):
        os.environ["TAPER_ATTN_BOUNDMAX"] = "0"
        return qc + 0.001 * flash_attention(qc, k, v, True)

    def proto(qc):
        return qc + 0.001 * flash_fwd_bound(qc, k, v, bq=1024, bk=1024)

    def proto_norm(qc):
        # the norm pre-pass cost alone, fused into the same program
        kn = jnp.sqrt(jnp.max(jnp.sum(
            k.astype(jnp.float32) ** 2, axis=-1), axis=(0, 1, 2)))
        qn = jnp.sqrt(jnp.max(jnp.sum(
            qc.astype(jnp.float32) ** 2, axis=-1)))
        o = flash_fwd_bound(qc, k, v, bq=1024, bk=1024)
        return qc + (0.001 * o * (1.0 + 0.0 * (kn + qn))).astype(qc.dtype)

    race([
        Contender("prod boundmax=1 (cond)", prod_on, q, (), n_hi=60,
                  n_lo=10),
        Contender("prod boundmax=0 (exact)", prod_off, q, (), n_hi=60,
                  n_lo=10),
        Contender("proto raw (no cond/norm)", proto, q, (), n_hi=60,
                  n_lo=10),
        Contender("proto + norms, no cond", proto_norm, q, (), n_hi=60,
                  n_lo=10),
    ], rounds=3, scale=f4 / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
