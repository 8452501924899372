"""Fused-vs-split attention backward A/B + fused-kernel block sweep at
the bench gate shape (B=2, H=8, S=4096, D=64, bf16, causal).

VERDICT r4 item 2: the fused single-sweep backward inherited
``_blocks_bwd``'s split-kernel tuning despite carrying ~1.6 MB more
resident scratch (full-length dQ accumulator + δ table), and nothing
raced fused-vs-split in the capture that grades the round.  This sweep
settles the default by measurement: full fwd+bwd time for the split
kernels at their swept blocks and the fused kernel across its own block
grid, interleaved in one process (device drift ±15% between processes —
see timing.py).

Roofline context: useful fwd+bwd flops at the gate shape are
120.3 GFLOP, every dot has a 64-wide contraction or output minor dim
(half the 128-wide MXU) → ceiling ≈ 98.5 TFLOP/s → structural minimum
≈ 1.22 ms.  The XLA oracle's ~11 ms means the composite speedup ceiling
is ≈ 9× — the historical ≥10× gate sits ABOVE the hardware ceiling.

Run: python benchmarks/sweep_attn_fused.py [S] [B]
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import Contender, race               # noqa: E402
from taper_tpu.ops.pallas.attention import flash_attention  # noqa: E402


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    h, d = 8, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
               for kk in ks)

    def step_of(fused, blocks):
        # env knobs are read at TRACE time inside _flash_bwd /
        # _blocks_bwd, and tracing happens while this body runs — so
        # setting them here pins the config per contender (the same
        # trick bench_w8a8_prefill uses for TAPER_W8A8)
        def step(qc, kc, vc):
            os.environ["TAPER_ATTN_FUSED_BWD"] = "1" if fused else "0"
            if blocks:
                os.environ["TAPER_ATTN_BWD_BLOCKS"] = blocks
            else:
                os.environ.pop("TAPER_ATTN_BWD_BLOCKS", None)
            gs = jax.grad(lambda a, kk_, vv: jnp.sum(
                flash_attention(a, kk_, vv, True).astype(jnp.float32)),
                argnums=(0, 1, 2))(qc, kc, vc)
            return qc + 0.001 * gs[0].astype(qc.dtype)
        return step

    flops = 3.5 * 4.0 * b * h * s * s * d / 2   # fwd(2 dots)+bwd(5)
    cs = [Contender("split default(1024,1024)", step_of(False, None),
                    q, (k, v), n_hi=30, n_lo=5),
          Contender("split 512,1024", step_of(False, "512,1024"),
                    q, (k, v), n_hi=30, n_lo=5)]
    for blocks in ("256,512", "512,512", "512,1024", "1024,1024",
                   "256,1024", "128,1024"):
        cs.append(Contender(f"fused {blocks}", step_of(True, blocks),
                            q, (k, v), n_hi=30, n_lo=5))
    race(cs, rounds=3, scale=flops / 1e12, unit="TFLOP/s(fwd+bwd)")
    os.environ.pop("TAPER_ATTN_BWD_BLOCKS", None)
    os.environ.pop("TAPER_ATTN_FUSED_BWD", None)


if __name__ == "__main__":
    main()
