"""Race the TRIANGULAR causal grid vs the clipped-fetch full sweep,
across block sizes, for fwd and full fwd+bwd — all interleaved in one
process (methodology: benchmarks/timing.py).

The triangular grid enumerates exactly the causal band's (q, kv) block
pairs in one linearized inner dim: zero idle grid steps, which is what
made small tiles lose in the rectangular sweep (fixed ~1.4us per grid
step whether or not the block runs).  Smaller square tiles then cut the
diagonal overcompute: at (512, 2048) the causal mask wastes 1/3 of
computed units; at (512, 512) only ~6%.

Run: python benchmarks/sweep_attn_tri.py [bf16] [S] [bwd]
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
    do_bwd = "bwd" in sys.argv[1:]
    b, h, d = 2, 8, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
    flops = 4.0 * b * h * s * s * d / 2
    if do_bwd:
        flops *= 3.5     # fwd + standard 2.5x-fwd bwd accounting

    def make(grid, bq, bk):
        def fwd(qc):
            os.environ["TAPER_ATTN_GRID"] = grid
            os.environ["TAPER_ATTN_FWD_BLOCKS"] = f"{bq},{bk}"
            os.environ["TAPER_ATTN_BWD_BLOCKS"] = f"{bq},{bk}"
            return flash_attention(qc, k, v, True)

        if not do_bwd:
            return lambda qc: qc + 0.001 * fwd(qc)

        def step(qc):
            o, vjp = jax.vjp(fwd, qc)
            (dq,) = vjp(o)
            return qc + 0.001 * dq
        return step

    cfgs = [("full", 512, 2048), ("full", 512, 1024),
            ("tri", 512, 2048), ("tri", 512, 1024),
            ("tri", 512, 512), ("tri", 256, 256), ("tri", 1024, 1024)]
    cfgs = [(g, bq, bk) for g, bq, bk in cfgs
            if bq <= s and bk <= s and s % bq == 0 and s % bk == 0
            and bk % bq == 0]
    tag = "fwd+bwd(q k v)" if do_bwd else "fwd"
    print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal {tag}", flush=True)
    race([Contender(f"{g:4s} {bq}x{bk}", make(g, bq, bk), q, (),
                    n_hi=30 if do_bwd else 60, n_lo=5 if do_bwd else 10)
          for g, bq, bk in cfgs],
         rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__":
    main()
