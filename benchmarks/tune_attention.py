"""Flash-attention tuning: block sizes and in-kernel dot precision.

Run: python benchmarks/tune_attention.py
"""

import sys

sys.path.insert(0, ".")

import importlib

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

A = importlib.import_module("taper_tpu.ops.pallas.attention")
from benchmarks.timing import Contender, race  # noqa: E402


def main():
    b, h, s, d = 4, 8, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32)
               for kk in ks)
    flops = 4.0 * b * h * s * s * d / 2

    def contender(bq, bk):
        def step(qc, kc, vc):
            orig = A._blocks
            A._blocks = lambda sq, sk: (bq, bk)
            try:
                y = A.flash_attention(qc, kc, vc, True)
            finally:
                A._blocks = orig
            return qc + 0.001 * y
        return Contender(f"fwd bq={bq} bk={bk}", step, q, (k, v),
                         n_hi=60, n_lo=10)

    cs = [contender(bq, bk)
          for bq in (128, 256, 512)
          for bk in (256, 512, 1024, 2048)
          if bq <= bk and s % bq == 0 and s % bk == 0]
    race(cs, rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
