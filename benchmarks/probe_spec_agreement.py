"""Instrument the spec_scale acceptance mystery: tokens/round sits at
~2.1 regardless of target convergence, draft dtype, train seq or
on-policy distillation — too constant to be statistics.

Measures, with the bench's own 151M/1.7M pair (params cached to /tmp
so reruns skip training):
  a) draft-vs-target argmax agreement teacher-forced on CORPUS windows
  b) target greedy generation from the bench prompts, then draft
     argmax agreement teacher-forced ON THE GENERATED text
  c) target SELF-consistency: full-apply argmax replay of its own
     cache-path generation (≠1.0 would mean the decode path and the
     batch path disagree on the target's own choices)
  d) per-round accepted-count histogram from an instrumented copy of
     the greedy acceptance rule run outside the loop: draft generates
     gamma tokens from each accepted context via its own cache-free
     full apply, compared to the target's full-apply argmax

Run: python benchmarks/probe_spec_agreement.py
"""
import os
import pathlib
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models, ops
from taper_tpu.utils.cache import enable_compilation_cache
from benchmarks.bench_spec_scale import (_corpus, _train_lm,
                                         _distill_draft)

CKPT = "/tmp/spec_scale_params.npz"


def get_pair(c, smax, seq):
    target = models.TinyGPT(vocab_size=256, dim=1024, depth=12,
                            num_heads=8, max_seq=smax, rope=True,
                            compute_dtype=jnp.bfloat16)
    draft = models.TinyGPT(vocab_size=256, dim=384, depth=4,
                           num_heads=6, max_seq=smax, rope=True,
                           compute_dtype=jnp.bfloat16)
    if os.path.exists(CKPT):
        flat = np.load(CKPT, allow_pickle=False)
        pt0 = target.init(jax.random.PRNGKey(0))
        pd0 = draft.init(jax.random.PRNGKey(7))
        lt, tdef = jax.tree.flatten(pt0)
        ld, ddef = jax.tree.flatten(pd0)
        pt = jax.tree.unflatten(tdef, [jnp.asarray(flat[f"t{i}"])
                                       for i in range(len(lt))])
        pd = jax.tree.unflatten(ddef, [jnp.asarray(flat[f"d{i}"])
                                       for i in range(len(ld))])
        print("loaded cached params", flush=True)
    else:
        pt, tl = _train_lm(target, c, 2400, lr=3e-4, seq=seq)
        print(f"target loss {tl:.3f}", flush=True)
        pd, ag = _distill_draft(draft, pt, target, c, 1200, seq=seq)
        print(f"draft agreement {ag:.3f}", flush=True)
        lt, _ = jax.tree.flatten(pt)
        ld, _ = jax.tree.flatten(pd)
        np.savez(CKPT,
                 **{f"t{i}": np.asarray(x) for i, x in enumerate(lt)},
                 **{f"d{i}": np.asarray(x) for i, x in enumerate(ld)})
    return target, draft, pt, pd


def main():
    enable_compilation_cache()
    ops.set_backend("xla")
    corpus = _corpus()
    c = jnp.asarray(corpus)
    plen, hi, gamma = 64, 192, 4
    smax = plen + hi + 16
    seq = min(256, smax - 1)
    target, draft, pt, pd = get_pair(c, smax, seq)
    bf = lambda p: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, p)
    ptb = bf(pt)

    start = int(len(corpus) * 0.92)
    pr = jnp.asarray(np.stack([corpus[start + i * 97:
                                      start + i * 97 + plen]
                               for i in range(8)]))

    # (a) corpus-window agreement
    starts = jax.random.randint(jax.random.PRNGKey(3), (64,), 0,
                                c.shape[0] - seq - 1)
    wins = jnp.take(c, starts[:, None] + jnp.arange(seq), axis=0)
    ta = jnp.argmax(jax.jit(target.apply)(pt, wins), -1)
    da = jnp.argmax(jax.jit(draft.apply)(pd, wins), -1)
    print(f"(a) corpus-window agreement: "
          f"{float(jnp.mean(ta == da)):.3f}", flush=True)

    # (b) generation-context agreement
    gen = jax.jit(lambda p, q: target.generate(p, q, hi))(ptb, pr)
    ta_g = jnp.argmax(jax.jit(target.apply)(pt, gen[:, :-1]), -1)
    da_g = jnp.argmax(jax.jit(draft.apply)(pd, gen[:, :-1]), -1)
    m = jnp.broadcast_to(
        jnp.arange(gen.shape[1] - 1)[None, :] >= plen - 1, ta_g.shape)
    agree_gen = float(jnp.sum((ta_g == da_g) * m) / jnp.sum(m))
    print(f"(b) generated-text agreement (draft vs target, "
          f"teacher-forced): {agree_gen:.3f}", flush=True)

    # (c) target self-consistency: does full-apply argmax reproduce the
    # cache-path generation?
    self_ok = float(jnp.sum((ta_g[:, plen - 1:] ==
                             gen[:, plen:]) * 1.0) /
                    (gen.shape[0] * (gen.shape[1] - plen)))
    print(f"(c) target self-consistency (full-apply argmax == own "
          f"generated tokens): {self_ok:.3f}", flush=True)

    # (d) draft free-running on generated prefixes: from each position,
    # does the draft's own 4-step greedy rollout match the target's
    # next 4 generated tokens?  (This is what the spec loop needs.)
    dgen = jax.jit(lambda p, q: draft.generate(p, q, gamma))(
        pd, gen[:, :plen])
    tg4 = gen[:, plen:plen + gamma]
    runm = jnp.cumprod((dgen[:, plen:plen + gamma] == tg4) * 1, axis=1)
    print(f"(d) draft 4-step rollout from the prompt: mean accepted "
          f"prefix {float(jnp.mean(jnp.sum(runm, 1))):.2f}/4",
          flush=True)

    # (e) DRAFT self-consistency: cache-path generation vs full-apply
    # argmax replay (the target's was 1.000; thin draft margins can
    # flip between the two numerics paths)
    dg = jax.jit(lambda p, q: draft.generate(p, q, hi))(pd, pr)
    da_r = jnp.argmax(jax.jit(draft.apply)(pd, dg[:, :-1]), -1)
    e = float(jnp.mean((da_r[:, plen - 1:] == dg[:, plen:]) * 1.0))
    print(f"(e) draft self-consistency: {e:.3f}", flush=True)

    # (f) in-loop decode step costs by whole-generation differencing
    # (per-call timing is garbage under the axon proxy)
    import time as _t

    def t_gen(fn, p, n):
        t0 = _t.perf_counter()
        out = fn(p, pr, n)
        float(jnp.sum(out[0][:1]))
        return _t.perf_counter() - t0

    for name, model, p in (("target", target, ptb),
                           ("draft", draft, pd)):
        fn = jax.jit(lambda pp, q, n, m=model: m.generate(pp, q, n),
                     static_argnums=2)
        t_gen(fn, p, 48), t_gen(fn, p, 192)      # compile
        ts = [(t_gen(fn, p, 48), t_gen(fn, p, 192))
              for _ in range(3)]
        step = min(bb - aa for aa, bb in ts) / (192 - 48)
        print(f"(f) {name} in-loop decode step: {step*1e6:.0f} us",
              flush=True)


if __name__ == "__main__":
    main()
