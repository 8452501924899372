"""Sweep backward block sizes for the flash attention kernels — all
configs interleaved in ONE race (process drift otherwise dominates).

The env knob is read at trace time, so each contender's step fn sets it
at the top of its own trace.

Run: python benchmarks/sweep_attn_bwd.py [bf16] [S] [b=B] [h=H] [d=D]
(defaults B2 H8 D64 — pass b=8 d=128 for the 170M MFU config's shape)
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
    kv = {a.split("=")[0]: int(a.split("=")[1])
          for a in sys.argv[1:] if "=" in a}
    b, h, d = kv.get("b", 2), kv.get("h", 8), kv.get("d", 64)
    causal = True
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
    flops = 4.0 * b * h * s * s * d / 2          # fwd flops (causal)

    def make_step(bq, bk):
        def step(qc):
            os.environ["TAPER_ATTN_BWD_BLOCKS"] = f"{bq},{bk}"
            gs = jax.grad(lambda a, kk, vv: jnp.sum(
                flash_attention(a, kk, vv, causal)
                .astype(jnp.float32)), argnums=(0, 1, 2))(qc, k, v)
            return qc + 0.001 * sum(g.astype(qc.dtype) for g in gs)
        return step

    cfgs = [(256, 256), (256, 512), (512, 512), (256, 1024),
            (512, 1024), (1024, 1024), (512, 2048)]
    # only race configs the kernel accepts (the env override now
    # raises on non-dividing blocks instead of silently falling
    # back and mislabeling the row)
    cfgs = [(bq, bk) for bq, bk in cfgs
            if bq <= s and bk <= s and s % bq == 0 and s % bk == 0
            and bk % bq == 0]
    print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal fwd+bwd(qkv)",
          flush=True)
    race([Contender(f"bwd blocks {bq}x{bk}", make_step(bq, bk), q, (),
                    n_hi=30, n_lo=5) for bq, bk in cfgs],
         rounds=3, scale=flops / 1e12, unit="TFLOP/s(fwd-flops)")


if __name__ == "__main__":
    main()
