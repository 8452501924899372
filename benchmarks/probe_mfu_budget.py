"""Decompose the TinyGPT train-step time (the bench.py MFU config).

Ablation variants, raced in one process — the delta from "full" prices
each component (dim 1024, depth 12, S=2048, B8, bf16 trunk):

  full       — the real step (flash attention, LN, vocab head, Adam)
  no-ln      — LayerNorms replaced by identity (prices LN's f32 HBM)
  no-head    — loss = mean(h^2) on final hidden (prices the 16K-vocab
               logits matmul + log_softmax + their backward)
  no-attn    — attention output replaced by q (prices flash fwd+bwd
               and the head reshapes/transposes)
  sgd        — Adam -> plain SGD (prices optimizer state traffic)

Measured (v5e, 85M config, full step = 160.5 ms):

  no-ln    153.8 ms  -> LayerNorms ≈ 7 ms (4%)
  no-head  149.5 ms  -> vocab logits + log_softmax + bwd ≈ 11 ms (7%)
  no-attn   63.7 ms  -> the WHOLE MHA path ≈ 97 ms (60%): QKV/O
                        projections (~15 ms of model matmul at GEMM
                        rates), flash fwd+bwd kernels (~35-45 ms at
                        their ~45 TF/s causal rate), head reshapes/
                        transposes and bwd re-layouts (the rest)
  sgd      161.1 ms  -> Adam update fully overlapped (≈ 0)

So MFU gains would have to come from the causal flash kernels' per-
grid-step fixed cost (see probe_attn_budget.py) and the transpose
traffic around them — the optimizer, LN and loss are already free-ish.

Run: python benchmarks/probe_mfu_budget.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import Contender, race     # noqa: E402
from taper_tpu import models, optim, ops          # noqa: E402
from taper_tpu.nn import transformer as T         # noqa: E402


def make_step(variant):
    # 85M config: the 170M one OOMs with two contenders' params + Adam
    # states + bwd activations resident at once on the 16 GB chip
    dim, depth, heads, vocab, b, s = 768, 10, 12, 16384, 8, 2048
    ops.set_backend("pallas")
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=s, rope=True,
                           compute_dtype=jnp.bfloat16)
    if variant == "no-ln":
        for blk in model.blocks:
            blk.ln1.apply = lambda p, x, **kw: x
            blk.ln2.apply = lambda p, x, **kw: x
    if variant == "no-attn":
        for blk in model.blocks:
            blk.attn.apply = lambda p, x, **kw: x * 0.5
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.SGD(1e-3) if variant == "sgd" else optim.Adam(1e-4)
    state = opt.init(params)
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, vocab)
    tgts = jnp.roll(toks, -1, axis=1)

    def step(carry, toks, tgts):
        params, state = carry
        def loss_of(p):
            if variant == "no-head":
                # stop before the vocab projection: embed+blocks+ln only
                x = model.tok.apply(p["tok"], toks)
                x = x.astype(jnp.bfloat16)
                for blk, bp in zip(model.blocks, p["blocks"]):
                    x = blk.apply(bp, x)
                x = model.ln_f.apply(p["ln_f"], x)
                return jnp.mean(x.astype(jnp.float32) ** 2)
            lp = jax.nn.log_softmax(model.apply(p, toks))
            return -jnp.mean(jnp.take_along_axis(lp, tgts[..., None],
                                                 axis=-1))
        _, g = jax.value_and_grad(loss_of)(params)
        return opt.update(g, state, params)

    return step, (params, state), (toks, tgts)


def main():
    # pairwise races (full vs one ablation at a time): five concurrent
    # 170M-param states OOM the chip; the "full" program hits the
    # compilation cache after the first pair.
    for v in ("no-ln", "no-head", "no-attn", "sgd"):
        cs = []
        for name in ("full", v):
            step, init, consts = make_step(name)
            cs.append(Contender(name, step, init, consts,
                                n_hi=8, n_lo=2))
        race(cs, rounds=3, scale=None, unit="ms")
        del cs


if __name__ == "__main__":
    main()
