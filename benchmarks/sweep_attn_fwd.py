"""Sweep FORWARD block sizes for the flash attention kernel — all
configs interleaved in one race (see sweep_attn_bwd.py).

Run: python benchmarks/sweep_attn_fwd.py [bf16] [S]
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas.attention import flash_attention  # noqa: E402
from benchmarks.timing import Contender, race            # noqa: E402


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    s = next((int(a) for a in sys.argv[1:] if a.isdigit()), 4096)
    b, h, d = 2, 8, 64
    causal = True
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
    flops = 4.0 * b * h * s * s * d / 2

    def make_fwd(bq, bk):
        def step(qc):
            os.environ["TAPER_ATTN_FWD_BLOCKS"] = f"{bq},{bk}"
            return qc + 0.001 * flash_attention(qc, k, v, causal)
        return step

    cfgs = [(256, 1024), (256, 2048), (512, 512), (512, 1024),
            (512, 2048), (1024, 1024), (512, 4096), (256, 4096)]
    # only race configs the kernel accepts (the env override now
    # raises on non-dividing blocks instead of silently falling
    # back and mislabeling the row)
    cfgs = [(bq, bk) for bq, bk in cfgs
            if bq <= s and bk <= s and s % bq == 0 and s % bk == 0
            and bk % bq == 0]
    print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal fwd", flush=True)
    race([Contender(f"fwd blocks {bq}x{bk}", make_fwd(bq, bk), q, (),
                    n_hi=60, n_lo=10) for bq, bk in cfgs],
         rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
