"""Diagnose the B=8 speculative-decode loss vs plain decode
(VERDICT r4 item 7 / r5 measurement: spec_b8_speedup 0.29).

Questions:
  1. acceptance — tokens per verify round (draft quality)?
  2. where the round budget goes — draft step vs target step vs
     verify chunk (per-op overhead floor vs HBM roofline)?
  3. does speculation win at the model scale it is designed for
     (target step HBM-bound, draft >> cheaper)?

Run: python benchmarks/probe_spec_b8.py
"""
import pathlib
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models, ops, optim
from taper_tpu.utils.cache import enable_compilation_cache


def train(model, c, steps, batch=32, seq=128):
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    state = opt.init(params)

    def loss_fn(p, key):
        starts = jax.random.randint(key, (batch,), 0,
                                    c.shape[0] - seq - 1)
        w = jnp.take(c, starts[:, None] + jnp.arange(seq + 1), axis=0)
        logits = model.apply(p, w[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, w[:, 1:, None],
                                             axis=-1))

    def body(carry, _):
        p, s, key = carry
        key, k = jax.random.split(key)
        _, g = jax.value_and_grad(loss_fn)(p, k)
        p, s = opt.update(g, s, p)
        return (p, s, key), None

    (params, _, _), _ = jax.jit(
        lambda p, s, k: jax.lax.scan(body, (p, s, k), None,
                                     length=steps))(
        params, state, jax.random.PRNGKey(1))
    return params


def bench_step(fn, *a, reps=50):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    ops.set_backend("xla")
    parts = [pathlib.Path(n).read_bytes()
             for n in ("README.md", "PARITY.md", "SURVEY.md",
                       "ROUND2.md")
             if pathlib.Path(n).exists()]
    corpus = np.frombuffer(b"\n\n".join(parts), np.uint8).astype(
        np.int32)
    c = jnp.asarray(corpus)
    plen, hi, gamma, batch = 64, 192, 4, 8
    smax = plen + hi + 16
    target = models.TinyGPT(vocab_size=256, dim=512, depth=6,
                            num_heads=8, max_seq=smax, rope=True)
    draft = models.TinyGPT(vocab_size=256, dim=128, depth=2,
                           num_heads=4, max_seq=smax, rope=True)
    pt = train(target, c, 1200)
    pd = train(draft, c, 1200)

    start = int(len(corpus) * 0.92)
    pr = jnp.asarray(np.stack([corpus[start + i * 97:
                                      start + i * 97 + plen]
                               for i in range(batch)]))

    # --- 1. acceptance ---------------------------------------------
    jspec = jax.jit(
        lambda p, d, q, pr_: target.speculative_generate(
            p, draft, d, q, hi, gamma=gamma, per_row=pr_,
            return_stats=True),
        static_argnums=3)
    for per_row in (True, False):
        out, st = jspec(pt, pd, pr, per_row)
        jax.block_until_ready(out)
        print(f"per_row={per_row}: rounds={int(st['rounds'])} "
              f"tokens/round={float(st['tokens_per_round']):.2f}")

    # --- 2. component costs ----------------------------------------
    ct = target.init_cache(batch)
    cd = draft.init_cache(batch)
    _, ct = jax.jit(target.prefill)(pt, pr, ct)
    _, cd = jax.jit(draft.prefill)(pd, pr, cd)
    pos = jnp.full((batch,), plen)
    tok = pr[:, -1]
    chunk = jnp.tile(tok[:, None], (1, gamma + 1))

    t_tstep = bench_step(jax.jit(target.decode_step), pt, tok, pos, ct)
    t_dstep = bench_step(jax.jit(draft.decode_step), pd, tok, pos, cd)
    t_chunk = bench_step(jax.jit(target.decode_chunk), pt, chunk,
                         pos, ct)
    print(f"target decode_step  {t_tstep * 1e6:7.1f} us "
          f"(weight-stream floor ~46 us at 19M bf16)")
    print(f"draft  decode_step  {t_dstep * 1e6:7.1f} us")
    print(f"target decode_chunk {t_chunk * 1e6:7.1f} us (gamma+1 pos)")
    round_cost = (gamma + 1) * t_dstep + t_chunk
    print(f"round cost = 5*draft + chunk = {round_cost * 1e6:.1f} us "
          f"-> breakeven tokens/round = "
          f"{round_cost / t_tstep:.2f}")


if __name__ == "__main__":
    main()
