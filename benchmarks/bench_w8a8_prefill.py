"""Model-level W8A8 measurement: PTQ TinyGPT prefill, bf16 dense vs
dequant-on-load (W8A16) vs W8A8 int8-MXU, at production dims.

ROUND3 found W8A8 a wash at dim 2048 (32.6 vs 33.3 ms) because each
linear paid its own dynamic activation-quant sweeps; this script is the
standing measurement for that claim and for the round-4 producer-fusion
work (VERDICT item 5).

Run: python benchmarks/bench_w8a8_prefill.py [dim] [batch] [seq]
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import Contender, race          # noqa: E402
from taper_tpu import models, ops                      # noqa: E402
from taper_tpu.quantization import ptq                 # noqa: E402
from taper_tpu.quantization.config import (            # noqa: E402
    QuantizationConfig, QuantizationType)


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    depth, heads, vocab = 8, dim // 128, 8192
    ops.set_backend("pallas")

    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=s, rope=True,
                           compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    qparams = ptq.quantize_params(
        params, QuantizationConfig(qtype=QuantizationType.INT8))
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, vocab)

    def dep(t, out):
        # scan carry must keep toks' int dtype: fold a runtime-zero
        # (not compile-foldable) data dependency on the logits back in
        return t + (jnp.sum(out) * 1e-30).astype(t.dtype)

    def fwd_bf16(t, p):
        return dep(t, model.apply(p, t)[:, -1])

    def fwd_w8a16(t, p):
        os.environ["TAPER_W8A8"] = "0"
        return dep(t, model.apply(p, t)[:, -1])

    def fwd_w8a8(t, p):
        os.environ["TAPER_W8A8"] = "1"
        return dep(t, model.apply(p, t)[:, -1])

    # analytic linear flops (ignoring attention/embed): 2*P_lin*tokens
    n_lin = depth * (4 + 8) * dim * dim    # qkvo + 2 mlp (ratio 4)
    flops = 2 * n_lin * b * s
    print(f"dim={dim} depth={depth} B={b} S={s} "
          f"(linear flops {flops/1e12:.2f} T)", flush=True)
    race([Contender("bf16 dense", fwd_bf16, toks, (params,),
                    n_hi=20, n_lo=4),
          Contender("w8a16 dequant-on-load", fwd_w8a16, toks, (qparams,),
                    n_hi=20, n_lo=4),
          Contender("w8a8 int8-MXU", fwd_w8a8, toks, (qparams,),
                    n_hi=20, n_lo=4)],
         rounds=3, scale=flops / 1e12, unit="TFLOP/s(linear)")
    os.environ.pop("TAPER_W8A8", None)


if __name__ == "__main__":
    main()
