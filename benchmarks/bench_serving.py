"""LM decode serving: f32 vs int8/int4 PTQ weights, raced in one process.

Autoregressive decode is weight-read bound (every step streams all
parameters from HBM for a batch of single tokens), so PTQ's dequant-
on-load is a real latency win here — unlike training, where activations
dominate.  GPT-ish config sized so weights dominate the cache reads.

Run: python benchmarks/bench_serving.py
"""

import os
import sys

sys.path.insert(0, ".")

# hand dequant-on-load kernels for the quantized variants (read at
# taper_tpu.ops import time)
os.environ.setdefault("TAPER_Q8_KERNEL", "1")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu import models, ops               # noqa: E402
from taper_tpu.quantization import ptq           # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from benchmarks.timing import Contender, race    # noqa: E402


def main():
    # measured-fastest decode config: xla backend (its matvec GEMM and
    # fused int8 dequant win at M=8); int4 routes to its Pallas kernel
    # on TPU regardless of backend (no viable XLA path).
    ops.set_backend("xla")
    dim, depth, heads, vocab, smax, batch = 2048, 6, 16, 4096, 256, 8
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           num_kv_heads=4)
    params = model.init(jax.random.PRNGKey(0))
    nbytes = model.param_bytes(params)
    print(f"params {model.param_count(params) / 1e6:.0f}M "
          f"({nbytes / 2**30:.2f} GiB f32)", flush=True)

    variants = [("f32", params)]
    for name, cfg in (("int8", QuantizationConfig.int8()),
                      ("int4", QuantizationConfig.int4())):
        qp = ptq.quantize_params(params, cfg)
        # embeddings + tied LM head stay f32 (standard practice: their
        # gather/einsum paths dequantize the whole table per step, which
        # erases the packed formats' read savings)
        qp["tok"] = params["tok"]
        qp["pos"] = params["pos"]
        print(f"{name}: {ptq.quantized_bytes(qp) / 2**30:.2f} GiB",
              flush=True)
        variants.append((name, qp))

    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, 8), 0,
                                vocab)

    # params must ride as jit ARGUMENTS — closure-captured weights would
    # be constant-folded into the HLO and blow the remote compiler's
    # upload limit (see timing.py docstring; learned again the hard way).
    def step(carry, p):
        tok, pos, caches = carry
        logits, caches = model.decode_step(p, tok, pos, caches)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (nxt, pos + 1, caches)

    cs = []
    for name, p in variants:
        init = (prompt[:, 0], jnp.int32(0), model.init_cache(batch))
        cs.append(Contender(f"decode {name}", step, init, (p,),
                            n_hi=40, n_lo=8))
    race(cs, rounds=3, scale=batch, unit="tokens/s")


def bench_prefill(plen=1024, batch=8):
    """Prompt processing (one-shot prefill) vs decode rate.

    Prefill runs the whole prompt through one flash forward per layer
    (matmul-bound); decode streams all weights per token (HBM-bound) —
    prompt tokens/s should be >=20x the decode tokens/s at P=1024."""
    dim, depth, heads, vocab, smax = 2048, 6, 16, 4096, plen + 128
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           num_kv_heads=4, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, plen), 0,
                                vocab)

    def make_prefill(backend):
        def pstep(pr, p):
            ops.set_backend(backend)       # trace-time switch
            logits, _ = model.prefill(p, pr, model.init_cache(batch))
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return pstep

    def dstep(carry, p):
        tok, pos, caches = carry
        ops.set_backend("xla")
        logits, caches = model.decode_step(p, tok, pos, caches)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, caches)

    print(f"prefill P={plen} B={batch} "
          f"({model.param_count(params) / 1e6:.0f}M params, bf16 trunk)",
          flush=True)
    dinit = (prompt[:, 0], jnp.int32(0), model.init_cache(batch))
    race([
        Contender("prefill flash (tok/s)", make_prefill("pallas"),
                  prompt, (params,), n_hi=30, n_lo=5),
        Contender("prefill xla (tok/s)", make_prefill("xla"),
                  prompt, (params,), n_hi=30, n_lo=5),
        Contender("decode (tok/s)", dstep, dinit, (params,),
                  n_hi=40, n_lo=8, scale=batch),
    ], rounds=3, scale=batch * plen, unit="tokens/s")


def bench_multiturn(plen=1024, chunk=32, batch=8):
    """Multi-turn serving: prefix-cache reuse vs re-prefilling.

    Turn 2 arrives with ``chunk`` new tokens on top of a ``plen``-token
    cached context.  With `generate_continued` the new chunk is
    chunk-prefilled against the live KV cache (one decode_chunk
    dispatch, O(chunk) work); without prefix caching the whole
    ``plen + chunk`` prompt re-prefills from scratch (O(plen) work
    re-done).  Reported as NEW-tokens/s — same numerator, so the ratio
    is the prefix-caching win (~(plen+chunk)/chunk at matmul rates,
    less dispatch overheads)."""
    ops.set_backend("xla")
    dim, depth, heads, vocab = 2048, 6, 16, 4096
    smax = plen + 2 * chunk
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           num_kv_heads=4, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, plen), 0,
                                vocab)
    first = jax.random.randint(jax.random.PRNGKey(2), (batch, chunk), 0,
                               vocab)
    print(f"multiturn: context P={plen}, new chunk C={chunk}, B={batch} "
          f"({model.param_count(params) / 1e6:.0f}M params, bf16 trunk)",
          flush=True)

    # turn-1 context, shared by every reuse iteration
    _, caches0 = model.prefill(params, prompt,
                               model.init_cache(batch))

    def reuse_step(carry, p, caches):
        ch = carry
        logits, _ = model.decode_chunk(p, ch, jnp.int32(plen), caches)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    def reprefill_step(carry, p):
        ch = carry
        full = jnp.concatenate([prompt, ch], axis=1)
        logits, _ = model.prefill(p, full, model.init_cache(batch))
        return jnp.argmax(logits[:, -chunk:], -1).astype(jnp.int32)

    race([
        Contender("turn-2 cache reuse (new tok/s)", reuse_step, first,
                  (params, caches0), n_hi=40, n_lo=8),
        Contender("turn-2 re-prefill (new tok/s)", reprefill_step, first,
                  (params,), n_hi=12, n_lo=3),
    ], rounds=3, scale=batch * chunk, unit="tokens/s")


def bench_engine(n_requests=32, slots=8, prompt_pad=64):
    """Continuous batching vs the two fixed-batch extremes.

    Mixed workload (ragged prompt lengths, per-request max_new in
    {16, 48, 128}) served three ways:

    * sequential — one request at a time (B=1 ragged generate; the
      latency-only deployment).  Decode is weight-read-bound, so B=1
      wastes ~all of the HBM stream on one row.
    * static batch — all requests in one ragged generate; every row
      pays the LONGEST row's max_new (the offline-batch oracle: one
      dispatch, maximal B, but stragglers hold the batch).
    * engine — `ServingEngine`: retired slots are re-admitted from the
      queue, so the decode program stays full of USEFUL rows; host
      scheduling costs one [K, B] fetch per block.

    Reported as useful generated tokens/s (sum of per-request
    max_new / wall).

    Measured (v5e, 273M bf16, P<=64 so decode is WEIGHT-read-bound):
    sequential 833, host engine 968, on-device offline_serve 1140/
    1356/1204 at slots 8/16/32, static batch 6902.  At short context
    extra static-batch rows are nearly free (weights dominate the HBM
    stream), so offline throughput favors the one big ragged batch;
    the schedulers' wins are ONLINE traffic (arrivals, per-request
    budgets, latency) and cache memory (slots << N rows).  At long
    context the per-row cache reads dominate and the tradeoff shifts
    toward small full-of-useful-rows batches (see bench_kvcache)."""
    import time

    import numpy as np

    from taper_tpu.serve import ServingEngine

    ops.set_backend("xla")
    dim, depth, heads, vocab = 2048, 6, 16, 4096
    max_new_mix = (16, 48, 128)
    smax = prompt_pad + max(max_new_mix) + 32
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           num_kv_heads=4, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    reqs = [(list(rng.integers(0, vocab, int(rng.integers(8, prompt_pad)))),
             max_new_mix[i % len(max_new_mix)])
            for i in range(n_requests)]
    useful = sum(m for _, m in reqs)
    print(f"engine: {n_requests} requests, prompts 8..{prompt_pad}, "
          f"max_new mix {max_new_mix}, slots={slots} "
          f"({model.param_count(params) / 1e6:.0f}M params, bf16 trunk)",
          flush=True)

    def pad_batch(items):
        b = len(items)
        out = np.zeros((b, prompt_pad), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, p in enumerate(items):
            out[i, :len(p)] = p
            lens[i] = len(p)
        return jnp.asarray(out), jnp.asarray(lens)

    jgen = jax.jit(
        lambda p, q, lens, n: model.generate(p, q, n, prompt_lens=lens),
        static_argnums=3)

    def run_sequential():
        for prompt, m in reqs:
            q, lens = pad_batch([prompt])
            float(jnp.sum(jgen(params, q, lens, m)[:, -1]))

    def run_static():
        q, lens = pad_batch([p for p, _ in reqs])
        float(jnp.sum(jgen(params, q, lens,
                           max(max_new_mix))[:, -1]))

    # one engine instance: its two jitted programs compile once and are
    # reused across runs (slots drain back to free after each run())
    eng = ServingEngine(model, params, slots=slots,
                        prompt_pad=prompt_pad, decode_block=16)

    def run_engine():
        for prompt, m in reqs:
            eng.submit(prompt, m)
        eng.run()

    from taper_tpu.serve import offline_serve

    q_all, lens_all = pad_batch([p for p, _ in reqs])
    mn_all = jnp.asarray([m for _, m in reqs], jnp.int32)

    def run_ondevice(n_slots):
        out, _ = offline_serve(model, params, q_all, lens_all, mn_all,
                               slots=n_slots)
        float(jnp.sum(out[:, -1]))

    results = []
    for name, fn in (("sequential B=1", run_sequential),
                     ("static batch", run_static),
                     ("engine (host loop)", run_engine),
                     ("on-device slots=8", lambda: run_ondevice(8)),
                     ("on-device slots=16", lambda: run_ondevice(16)),
                     ("on-device slots=32", lambda: run_ondevice(32))):
        fn()                                  # compile + warm
        t = min(_timed(fn) for _ in range(2))
        results.append((name, t))
    base = results[0][1]
    for name, t in results:
        print(f"  {name:22s} {useful / t:9.1f} useful tok/s "
              f"({t:6.2f}s, {base / t:4.1f}x vs sequential)",
              flush=True)


def _timed(fn):
    import time
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_kvcache(smax=4096, batch=8):
    """Long-context decode: f32 vs bf16 vs quantized-int8 KV cache.

    Every decode step streams the WHOLE [B, H, Smax, D] cache of every
    layer (masked attend over a static-shape cache), so at long context
    the cache — not the weights — dominates the HBM traffic and the
    int8 cache's 4×/2× byte saving shows up directly in tokens/s."""
    ops.set_backend("xla")
    dim, depth, heads, vocab = 1024, 8, 8, 4096
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    cache_mb = (batch * heads * smax * (dim // heads) * 2 * depth
                / 2**20)
    print(f"kvcache decode B={batch} Smax={smax} "
          f"({model.param_count(params) / 1e6:.0f}M params; cache "
          f"{cache_mb:.0f} MB/byte-of-dtype)", flush=True)

    def step(carry, p):
        tok, pos, caches = carry
        logits, caches = model.decode_step(p, tok, pos, caches)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1,
                caches)

    tok0 = jnp.zeros((batch,), jnp.int32)
    cs = []
    for name, kw in (("f32 cache", {"dtype": jnp.float32}),
                     ("bf16 cache", {"dtype": jnp.bfloat16}),
                     ("int8 cache", {"quantized": True})):
        init = (tok0, jnp.int32(0), model.init_cache(batch, **kw))
        cs.append(Contender(f"decode {name}", step, init, (params,),
                            n_hi=40, n_lo=8))

    # ring cache on a sliding-window variant of the same model: the
    # decode stream reads W rows instead of Smax — at W=512 that is
    # 1/8 the cache bytes of even the full-length int8 cache
    wmodel = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                            num_heads=heads, max_seq=smax, rope=True,
                            window=512, compute_dtype=jnp.bfloat16)

    def wstep(carry, p):
        tok, pos, caches = carry
        logits, caches = wmodel.decode_step(p, tok, pos, caches)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1,
                caches)

    for name, kw in (("bf16 full (window model)", {}),
                     ("bf16 ring W=512", {"ring": True}),
                     ("int8 ring W=512", {"ring": True,
                                          "quantized": True})):
        init = (tok0, jnp.int32(0), wmodel.init_cache(
            batch, dtype=jnp.bfloat16, **kw))
        cs.append(Contender(f"decode {name}", wstep, init, (params,),
                            n_hi=40, n_lo=8))
    race(cs, rounds=3, scale=batch, unit="tokens/s")


def bench_paged(smax=4096, batch=16, bs=128):
    """Paged vs contiguous KV cache at MIXED request lengths (the
    serving case paging exists for: half the slots hold short 256-token
    contexts, half long ones).

    The contiguous cache reads [B, H, Smax, D] every step regardless of
    true lengths; the paged pallas kernel reads only each slot's
    allocated blocks (the index-map clamp elides the rest of the DMA),
    and pool MEMORY is proportional to tokens actually held.  The
    "paged xla-gather" row prices the materialized gather the kernel
    avoids (impl="xla").

    Measured (v5e, r3): mixed 256/4032 — contiguous 3845 tok/s, paged
    pallas 3585 (0.93×, with the pool 1.8× smaller), paged INT8
    pallas **4497 (1.17×, pool ~3.5× smaller)**, paged xla-gather
    1003 (the gather is unusable; the kernel is what makes paging
    viable).  All-short 256 — paged pallas **14017 vs 3841 = 3.7×**
    (and the pool is 18× smaller): when true lengths ≪ Smax the
    contiguous cache's fixed Smax-row read is pure waste."""
    import os
    import numpy as np

    ops.set_backend("xla")
    dim, depth, heads, vocab = 1024, 8, 8, 4096
    model = models.TinyGPT(vocab_size=vocab, dim=dim, depth=depth,
                           num_heads=heads, max_seq=smax, rope=True,
                           compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    # rows alternate short/long; long rows start 64 below smax so the
    # timing chain's +1-per-step positions stay in range
    lens = np.asarray([256 if i % 2 == 0 else smax - 64
                       for i in range(batch)], np.int32)
    mb = smax // bs
    n_alloc = int(sum(-(-(l + 64) // bs) for l in lens))
    pools = model.init_paged_cache(n_alloc + 1, bs)
    nxt = 1
    tables_np = np.zeros((batch, mb), np.int32)
    for i, l in enumerate(lens):
        nb = -(-(int(l) + 64) // bs)
        tables_np[i, :nb] = np.arange(nxt, nxt + nb)
        nxt += nb
    tables = jnp.asarray(tables_np)
    d = dim // heads
    contig_mb = batch * heads * smax * d * 2 * depth * 2 / 2**20
    paged_mb = (n_alloc + 1) * heads * bs * d * 2 * depth * 2 / 2**20
    print(f"paged decode B={batch} Smax={smax} lens 256/{smax - 64} "
          f"bs={bs}: contiguous cache {contig_mb:.0f} MB vs pool "
          f"{paged_mb:.0f} MB ({contig_mb / paged_mb:.1f}x)",
          flush=True)

    def cstep(carry, p):
        tok, pos, caches = carry
        logits, caches = model.decode_step(p, tok, pos, caches)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1,
                caches)

    def pstep_impl(impl):
        def pstep(carry, p, tables):
            tok, pos, pools = carry
            logits, pools = model.decode_step_paged(p, tok, pos, pools,
                                                    tables, impl=impl)
            return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1,
                    pools)
        return pstep

    tok0 = jnp.zeros((batch,), jnp.int32)
    pos0 = jnp.asarray(lens)
    cs = [Contender("mixed: contiguous bf16",
                    cstep, (tok0, pos0, model.init_cache(batch)),
                    (params,), n_hi=40, n_lo=8),
          Contender("mixed: paged xla-gather", pstep_impl("xla"),
                    (tok0, pos0, jax.tree.map(jnp.copy, pools)),
                    (params, tables), n_hi=40, n_lo=8),
          Contender("mixed: paged pallas kernel", pstep_impl("pallas"),
                    (tok0, pos0, pools),
                    (params, tables), n_hi=40, n_lo=8)]
    # int8 paged pools: the quantized cache's byte saving composes
    # with paging (half the bf16 pool bytes + per-position scales)
    q_pools = model.init_paged_cache(n_alloc + 1, bs, quantized=True)
    cs.append(Contender("mixed: paged int8 kernel",
                        pstep_impl("pallas"),
                        (tok0, pos0, q_pools), (params, tables),
                        n_hi=40, n_lo=8))
    # all-short scenario: every row holds 256 tokens — the contiguous
    # cache still reads Smax rows/step, the paged kernel only 3 blocks
    pos_s = jnp.full((batch,), 256, jnp.int32)
    short_tables = jnp.asarray(
        np.arange(1, batch * 3 + 1, dtype=np.int32).reshape(batch, 3))
    short_tables = jnp.pad(short_tables, ((0, 0), (0, mb - 3)))
    short_pools = model.init_paged_cache(batch * 3 + 1, bs)
    cs += [Contender("all-short: contiguous bf16",
                     cstep, (tok0, pos_s, model.init_cache(batch)),
                     (params,), n_hi=40, n_lo=8),
           Contender("all-short: paged pallas kernel",
                     pstep_impl("pallas"), (tok0, pos_s, short_pools),
                     (params, short_tables), n_hi=40, n_lo=8)]
    race(cs, rounds=3, scale=batch, unit="tokens/s")


def bench_speculative(hi=192, lo=48, plen=64):
    """Speculative greedy decoding vs plain decode on a TRAINED
    target/draft byte-LM pair (training both on the repo's checked-in
    markdown makes the acceptance rate a real property of two models
    that genuinely agree, not a self-draft ceiling).

    Timing: whole-generation difference — t(max_new=hi) − t(max_new=lo)
    over (hi − lo) tokens cancels prefill, compile and tunnel constants
    (see timing.py).  Reports tokens/s per variant plus the measured
    mean accepted length per verify round."""
    import pathlib
    import time

    import numpy as np

    ops.set_backend("xla")
    parts = [pathlib.Path(n).read_bytes()
             for n in ("README.md", "PARITY.md", "SURVEY.md", "ROUND2.md")
             if pathlib.Path(n).exists()]
    corpus = np.frombuffer(b"\n\n".join(parts), np.uint8).astype(np.int32)
    assert len(corpus) > 20_000, "run from the repo root"
    c = jnp.asarray(corpus)

    smax = plen + hi + 16
    target = models.TinyGPT(vocab_size=256, dim=512, depth=6,
                            num_heads=8, max_seq=smax, rope=True)
    draft = models.TinyGPT(vocab_size=256, dim=128, depth=2,
                           num_heads=4, max_seq=smax, rope=True)

    from taper_tpu import optim

    def train(model, steps, lr=1e-3, batch=32, seq=128):
        params = model.init(jax.random.PRNGKey(0))
        opt = optim.Adam(lr)
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
            l, g = jax.value_and_grad(loss_fn)(p, k)
            p, s = opt.update(g, s, p)
            return (p, s, key), l

        (params, _, _), losses = jax.jit(
            lambda p, s, k: jax.lax.scan(body, (p, s, k), None,
                                         length=steps))(
            params, state, jax.random.PRNGKey(1))
        print(f"  trained {model.param_count(params)/1e6:.1f}M params, "
              f"final loss {float(losses[-1]):.3f} nats/byte", flush=True)
        return params

    print("training target (512x6) and draft (128x2) byte LMs ...",
          flush=True)
    pt = train(target, 1200)
    pd = train(draft, 1200)

    for batch in (1, 4, 8):
        start = int(len(corpus) * 0.92)
        prompts = np.stack([corpus[start + i * 97:
                                   start + i * 97 + plen]
                            for i in range(batch)])
        pr = jnp.asarray(prompts)

        jgen = jax.jit(lambda p, q, n: target.generate(p, q, n),
                       static_argnums=2)
        jspec = jax.jit(
            lambda p, d, q, n, g: target.speculative_generate(
                p, draft, d, q, n, gamma=g),
            static_argnums=(3, 4))
        jspec_lk = jax.jit(
            lambda p, d, q, n, g: target.speculative_generate(
                p, draft, d, q, n, gamma=g, per_row=False),
            static_argnums=(3, 4))

        def t_run(fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.sum(out[0][:1]))
            return time.perf_counter() - t0

        variants = [("plain greedy decode",
                     lambda n: t_run(jgen, pt, pr, n))]
        for g in (2, 4, 6):
            variants.append((f"speculative γ={g}",
                             (lambda gg: lambda n: t_run(
                                 jspec, pt, pd, pr, n, gg))(g)))
            _, st = target.speculative_generate(
                pt, draft, pd, pr, hi, gamma=g, return_stats=True)
            print(f"  B={batch} γ={g}: {float(st['tokens_per_round']):.2f}"
                  f" tokens accepted/round "
                  f"({int(st['rounds'])} rounds for {hi} tokens)",
                  flush=True)
        if batch > 1:
            # the r3 lockstep-min scheme, kept for the per-row A/B
            variants.append(("speculative γ=4 lockstep",
                             lambda n: t_run(jspec_lk, pt, pd, pr,
                                             n, 4)))

        for _, f in variants:          # compile both lengths
            f(lo), f(hi)
        times = {name: [1e9, 1e9] for name, _ in variants}
        for _ in range(3):             # interleaved (device drift)
            for name, f in variants:
                times[name][0] = min(times[name][0], f(lo))
                times[name][1] = min(times[name][1], f(hi))
        base = None
        for name, _ in variants:
            t_lo, t_hi = times[name]
            per_tok = max(t_hi - t_lo, 1e-9) / (hi - lo)
            tps = batch / per_tok
            if base is None:
                base = tps
            print(f"  B={batch} {name:24s} {tps:9.1f} tokens/s "
                  f"({per_tok*1e3:.2f} ms/tok, {tps/base:.2f}x)",
                  flush=True)


if __name__ == "__main__":
    if "prefill" in sys.argv[1:]:
        bench_prefill()
    elif "kvcache" in sys.argv[1:]:
        bench_kvcache()
    elif "speculative" in sys.argv[1:]:
        bench_speculative()
    elif "multiturn" in sys.argv[1:]:
        bench_multiturn()
    elif "engine" in sys.argv[1:]:
        bench_engine()
    elif "paged" in sys.argv[1:]:
        bench_paged()
    else:
        main()
