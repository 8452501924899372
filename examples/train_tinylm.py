"""Train a TinyGPT causal LM on the on-device sort task.

Beyond-reference example (the reference's model zoo stops at MLP/CNN):
a decoder-only transformer learns to emit the sorted copy of its input
digits — a task that is chance-level (~1/10) until content-based
attention works.  Everything — data generation (jax.random + jnp.sort),
forward, attention, backward, Adam — compiles into ONE scanned XLA
program; the host only sees the per-eval metrics.

At the default S=128 the measured attention dispatch uses XLA's fused
attention (fastest below the S=1024 crossover); pass ``--length 511``
(S=1024) or more — or set ``TAPER_FLASH_MIN=128`` — to exercise the
flash kernel end-to-end.

Run: python examples/train_tinylm.py [--backend pallas] [--bf16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu import models, ops, optim
from taper_tpu.data.seq import (sort_task_batch, sort_task_vocab,
                                masked_token_loss)
from taper_tpu.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas"])
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--length", type=int, default=63,
                    help="digits per sequence (S = 2*length + 2)")
    ap.add_argument("--lr", type=float, default=None,
                    help="default: per-optimizer (adam/adamw 1e-3, "
                         "lion 1e-4, muon 0.02, adafactor 0.05)")
    ap.add_argument("--opt", default="adam",
                    choices=["adam", "adamw", "lion", "muon", "adafactor"])
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 trunk (params/softmax/logits stay f32)")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--z-loss", type=float, default=0.0,
                    help="PaLM-style logit regularizer coefficient")
    ap.add_argument("--rope", action="store_true",
                    help="rotary position embeddings (drops the learned "
                         "position table)")
    ap.add_argument("--kv-heads", type=int, default=0,
                    help="GQA: number of KV heads (0 = same as --heads)")
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window attention over the last W "
                         "positions (0 = full causal)")
    ap.add_argument("--experts", type=int, default=0,
                    help="MoE: experts per FFN (0 = dense)")
    args = ap.parse_args()

    enable_compilation_cache()
    ops.set_backend(args.backend)

    seq = 2 * args.length + 2
    vocab = sort_task_vocab()
    model = models.TinyGPT(
        vocab_size=vocab, dim=args.dim, depth=args.depth,
        num_heads=args.heads, max_seq=seq, rope=args.rope,
        num_kv_heads=args.kv_heads or None,
        window=args.window or None,
        n_experts=args.experts,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    params = model.init(jax.random.PRNGKey(0))
    print(f"TinyGPT dim={args.dim} depth={args.depth} heads={args.heads} "
          f"S={seq} vocab={vocab} params={model.param_count(params):,} "
          f"backend={args.backend} bf16={args.bf16}")

    # Each optimizer wants a different lr scale; an unset --lr picks the
    # per-optimizer default.
    defaults = {"adam": 1e-3, "adamw": 1e-3, "lion": 1e-4,
                "muon": 0.02, "adafactor": 0.05}
    lr = defaults[args.opt] if args.lr is None else args.lr
    make_opt = {
        "adam": lambda: optim.Adam(lr, weight_decay=0.0),
        "adamw": lambda: optim.AdamW(lr, weight_decay=0.01),
        "lion": lambda: optim.Lion(lr),
        "muon": lambda: optim.Muon(lr),
        "adafactor": lambda: optim.Adafactor(lr),
    }
    opt = make_opt[args.opt]()
    opt_state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, args.batch, args.length)
        logits = model.apply(params, toks)
        return masked_token_loss(logits, tgts, mask, z_loss=args.z_loss)

    def train_chunk(params, opt_state, key, n):
        """n steps in one scanned program; returns last loss/acc."""
        def step(carry, k):
            params, opt_state = carry
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, k)
            params, opt_state = opt.update(grads, opt_state, params)
            return (params, opt_state), (loss, acc)
        keys = jax.random.split(key, n)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, losses[-1], accs[-1]

    chunk = jax.jit(train_chunk, static_argnums=(3,),
                    donate_argnums=(0, 1))

    eval_fn = jax.jit(lambda p, k: loss_fn(p, k)[1])

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    done = 0
    eval_acc = 0.0
    while done < args.steps:
        n = min(args.eval_every, args.steps - done)
        key, k1, k2 = jax.random.split(key, 3)
        params, opt_state, loss, acc = chunk(params, opt_state, k1, n)
        done += n
        eval_acc = float(eval_fn(params, k2))
        print(f"step {done:5d}  loss {float(loss):.4f}  "
              f"train acc {float(acc):.3f}  eval acc {eval_acc:.3f}",
              flush=True)
    dt = time.perf_counter() - t0
    toks = args.steps * args.batch * seq
    print(f"total {dt:.1f}s — {toks / dt:,.0f} tokens/s "
          f"(incl. compile)")
    if eval_acc >= 0.99:
        print("sort task SOLVED (eval acc >= 99%)")

    # Serving path: greedy KV-cache generation from [BOS] digits [SEP]
    # prompts (one scanned decode program), scored as exact next-token
    # match over the generated sorted segment.
    toks_g, _, _ = sort_task_batch(jax.random.PRNGKey(99), 32,
                                   args.length)
    prompt = toks_g[:, :args.length + 2]
    expect = toks_g[:, args.length + 2:]
    t0 = time.perf_counter()
    gen = jax.jit(lambda p, pr: model.generate(p, pr, args.length))(
        params, prompt)
    got = gen[:, args.length + 2:]
    tok_acc = float(jnp.mean((got == expect).astype(jnp.float32)))
    seq_acc = float(jnp.mean(jnp.all(got == expect, axis=1)
                             .astype(jnp.float32)))
    dt = time.perf_counter() - t0
    n_dec = 32 * (seq - 1)
    print(f"generate: token acc {tok_acc:.3f}, whole-sequence acc "
          f"{seq_acc:.3f} ({n_dec / dt:,.0f} tokens/s decode incl. "
          f"compile)")


if __name__ == "__main__":
    main()
