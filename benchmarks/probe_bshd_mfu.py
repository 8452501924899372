"""A/B the transpose-free [B,S,H·D] attention path at the 170M MFU
config (dim 1024, depth 12, heads 8, D=128, S=2048, B=8, bf16).

probe_mfu_budget.py (r4) measured the MHA path at ~60% of the 219 ms
step with the [B,S,HD] ↔ [B,H,S,D] relayout copies around the flash
kernels the largest non-matmul item.  The BSHD path (r5,
ops.attention_bshd) deletes those copies by reading/writing the
projection layout directly in the kernels' index maps.

Run: python benchmarks/probe_bshd_mfu.py
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import timeit_scan                  # noqa: E402
from taper_tpu import models, optim, ops                   # noqa: E402


def step_time(bshd: bool, b=8, s=2048):
    os.environ["TAPER_ATTN_BSHD"] = "1" if bshd else "0"
    ops.set_backend("pallas")
    dim, depth, heads, vocab = 1024, 12, 8, 16384
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=s, rope=True,
                           compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-4)
    state = opt.init(params)
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, vocab)
    tgts = jnp.roll(toks, -1, axis=1)

    def step(carry, toks, tgts):
        params, state = carry
        def loss_of(p):
            lp = jax.nn.log_softmax(model.apply(p, toks))
            return -jnp.mean(jnp.take_along_axis(lp, tgts[..., None],
                                                 axis=-1))
        _, g = jax.value_and_grad(loss_of)(params)
        return opt.update(g, state, params)

    t = timeit_scan(step, (params, state), (toks, tgts), n_hi=12, n_lo=3)
    n_params = model.param_count(params)
    flops = 3 * (2 * n_params * b * s
                 + depth * 4 * b * s * s * dim * 0.5)
    return t, flops / t / 197e12


def main():
    # interleave the two configs to ride out device drift
    ts = {True: [], False: []}
    for _ in range(2):
        for bshd in (False, True):
            t, mfu = step_time(bshd)
            ts[bshd].append(t)
            print(f"bshd={int(bshd)}: step {t*1e3:7.1f} ms  "
                  f"mfu {mfu:.4f}", flush=True)
    t0, t1 = min(ts[False]), min(ts[True])
    print(f"best: old {t0*1e3:.1f} ms vs bshd {t1*1e3:.1f} ms "
          f"-> {t0/t1:.3f}x", flush=True)
    os.environ.pop("TAPER_ATTN_BSHD", None)


if __name__ == "__main__":
    main()
