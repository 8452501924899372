"""Byte-level language model on the repo's own documentation.

Zero-egress real-text LM: the corpus is the checked-in markdown
(README/PARITY/SURVEY — ~90 KB of real English + tables), vocab = 256
bytes.  TinyGPT with RoPE trains next-byte prediction (reported in
bits/byte) on random windows, then greedily/temperature-samples a
continuation from a prompt — end-to-end text modeling with no
downloads.

Run: python examples/train_bytelm.py [--steps 2000] [--bf16]

``--bpe N`` trains a byte-level BPE tokenizer (data/tokenizer.py) on
the corpus first and models the merged tokens instead of raw bytes —
the same text at ~2x fewer positions; bits/byte stays the comparable
metric (per-token loss / learned bytes-per-token).

``--packed`` switches training to PACKED paragraphs (data/packing.py):
the corpus splits into blank-line documents, multiple documents share
each row under segment-masked attention with per-document positions,
and the loss mask keeps targets inside documents — the padding-free
pretraining data path (cf. benchmarks/bench_packing.py: 5.6× real
tokens/s over right-padding at a web-like length mix).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models, ops, optim
from taper_tpu.utils.cache import enable_compilation_cache

_LN2 = float(np.log(2.0))


def load_corpus(root="."):
    parts = []
    for name in ("README.md", "PARITY.md", "SURVEY.md", "ROUND2.md"):
        p = pathlib.Path(root) / name
        if p.exists():
            parts.append(p.read_bytes())
    data = b"\n\n".join(parts)
    if len(data) < 20_000:
        raise SystemExit(
            "corpus not found — run from the repo root (needs the "
            "checked-in README.md/PARITY.md/SURVEY.md)")
    return np.frombuffer(data, np.uint8).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--sample-bytes", type=int, default=118)
    ap.add_argument("--bpe", type=int, default=0, metavar="VOCAB",
                    help="train a BPE tokenizer to this vocab size and "
                         "model tokens instead of raw bytes")
    ap.add_argument("--packed", action="store_true",
                    help="train on packed paragraph documents "
                         "(segment-masked attention, per-doc positions)")
    args = ap.parse_args()

    enable_compilation_cache()
    ops.set_backend(args.backend)

    corpus = load_corpus()
    raw_all = bytes(corpus.astype(np.uint8))
    n_bytes = len(corpus)
    tok = None
    vocab = 256
    if args.bpe:
        from taper_tpu.data.tokenizer import BPETokenizer
        raw = bytes(corpus.astype(np.uint8))
        tok = BPETokenizer.train(raw, args.bpe)
        corpus = np.asarray(tok.encode(raw), np.int32)
        vocab = tok.vocab_size
        print(f"BPE: vocab {vocab}, corpus {n_bytes:,} bytes -> "
              f"{len(corpus):,} tokens "
              f"({n_bytes / len(corpus):.2f} bytes/token)")
    bytes_per_pos = n_bytes / len(corpus)
    split = int(len(corpus) * 0.9)
    train_c = jnp.asarray(corpus[:split])
    val_c = jnp.asarray(corpus[split:])
    print(f"corpus: {len(corpus):,} positions "
          f"(train {split:,} / val {len(corpus) - split:,})")

    model = models.TinyGPT(
        vocab_size=vocab, dim=args.dim, depth=args.depth,
        num_heads=args.heads, max_seq=args.seq, rope=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    params = model.init(jax.random.PRNGKey(0))
    print(f"params: {model.param_count(params):,}")

    opt = optim.Adam(args.lr)
    sched = optim.WarmupCosineLR(args.lr, t_max=args.steps,
                                 warmup=args.steps // 20,
                                 min_lr=args.lr * 0.05)
    lrs = sched.schedule_array()
    opt_state = opt.init(params)

    def windows(c, key, batch, seq):
        starts = jax.random.randint(key, (batch,), 0,
                                    c.shape[0] - seq - 1)
        idx = starts[:, None] + jnp.arange(seq + 1)[None, :]
        return jnp.take(c, idx, axis=0)

    packed_rows = None
    if args.packed:
        from taper_tpu.data.packing import (pack_documents,
                                            packing_efficiency)
        # paragraph documents from the train portion's raw text
        # (raw_all survives above whether or not BPE re-encoded corpus)
        cut = int(len(raw_all) * 0.9)
        paras = [d for d in raw_all[:cut].split(b"\n\n") if len(d) >= 2]
        if tok is None:
            docs = [np.frombuffer(d, np.uint8).astype(np.int32).tolist()
                    for d in paras]
        else:
            docs = [tok.encode(d) for d in paras]
        docs = [d for d in docs if len(d) >= 2]
        pk = pack_documents(docs, args.seq)
        packed_rows = {k: jnp.asarray(v) for k, v in pk.items()}
        n_rows = pk["tokens"].shape[0]
        print(f"packed: {len(docs)} paragraph docs -> {n_rows} rows "
              f"({packing_efficiency(pk):.1%} full)")

    def loss_fn(params, c, key):
        if args.packed and c is train_c:
            rows = jax.random.randint(key, (args.batch,), 0,
                                      packed_rows["tokens"].shape[0])
            tokb = jnp.take(packed_rows["tokens"], rows, 0)
            tgtb = jnp.take(packed_rows["targets"], rows, 0)
            maskb = jnp.take(packed_rows["loss_mask"], rows, 0)
            segb = jnp.take(packed_rows["segment_ids"], rows, 0)
            posb = jnp.take(packed_rows["positions"], rows, 0)
            return model.loss(params, tokb, tgtb, maskb,
                              segment_ids=segb, positions=posb)[0]
        w = windows(c, key, args.batch, args.seq)
        logits = model.apply(params, w[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, w[:, 1:, None], axis=-1)
        return jnp.mean(nll)

    def chunk(params, opt_state, key, step0, n):
        def body(carry, i):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, train_c, k)
            opt_state = optim.Adam.set_lr(opt_state, lrs[step0 + i])
            params, opt_state = opt.update(grads, opt_state, params)
            return (params, opt_state, key), loss
        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), jnp.arange(n))
        return params, opt_state, losses[-1]

    jchunk = jax.jit(chunk, static_argnums=(4,), donate_argnums=(0, 1))
    jeval = jax.jit(lambda p, k: loss_fn(p, val_c, k))

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        n = min(args.eval_every, args.steps - done)
        key, k1, k2 = jax.random.split(key, 3)
        params, opt_state, tl = jchunk(params, opt_state, k1,
                                       jnp.int32(done), n)
        done += n
        vl = float(jeval(params, k2))
        scale = _LN2 * bytes_per_pos         # nats/token -> bits/byte
        print(f"step {done:5d}  train {float(tl) / scale:.3f} bpb  "
              f"val {vl / scale:.3f} bpb", flush=True)
    dt = time.perf_counter() - t0
    nbytes = args.steps * args.batch * args.seq * bytes_per_pos
    print(f"total {dt:.1f}s — {nbytes / dt:,.0f} bytes/s "
          f"(incl. compile)")

    # sample a continuation from a real prompt
    prompt_txt = b"## Design"
    if tok is not None:
        pids = np.asarray(tok.encode(prompt_txt), np.int32)
    else:
        pids = np.frombuffer(prompt_txt, np.uint8).astype(np.int32)
    prompt = jnp.asarray(pids)[None, :]
    out = jax.jit(lambda p, pr: model.generate(
        p, pr, args.sample_bytes, temperature=0.8,
        key=jax.random.PRNGKey(7)))(params, prompt)
    ids = np.asarray(out[0])
    if tok is not None:
        text = tok.decode(ids)
    else:
        text = bytes(ids.astype(np.uint8)).decode(
            "utf-8", errors="replace")
    print("--- sample ---")
    print(text)


if __name__ == "__main__":
    main()
