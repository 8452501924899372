"""LoRA fine-tuning: adapt a pretrained TinyGPT to a shifted task.

Beyond the reference (no fine-tuning story there — its training stack is
train-from-scratch only, `src/train.rs`): this demonstrates the standard
production adaptation loop on the framework's own LM.

  1. PRETRAIN TinyGPT on ascending sort ([BOS] d.. [SEP] sorted(d)..).
  2. Task shift: evaluate on DESCENDING sort — near chance, the base
     model confidently emits the wrong (ascending) order.
  3. LoRA fine-tune: freeze every base weight; train only rank-r factor
     pairs on the attention/MLP projections (~9% of params at this toy
     dim=128 — the fraction scales as 2r/dim, so <1% at production
     dims; optimizer state exists only for the factors).
  4. Merge the adapter for serving (zero-overhead) and verify the merged
     model matches the patched one.

Everything compiles into scanned XLA programs like the other examples;
the LoRA patch (`W + (alpha/r)·b@a`) is traced into the same step, so
fine-tuning runs at essentially full-training speed while updating a
tiny state.

Run: python examples/lora_finetune.py [--rank 8] [--bf16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np
import jax.numpy as jnp

from taper_tpu import models, ops, optim
from taper_tpu.data.seq import (sort_task_batch, sort_task_vocab,
                                masked_token_loss)
from taper_tpu.nn.lora import LoRA
from taper_tpu.utils.cache import enable_compilation_cache


def make_chunk(opt, loss_of_params):
    """Scanned n-step training program over whichever tree
    ``loss_of_params`` differentiates — the full params (pretrain) or
    the LoRA factor tree (fine-tune, base params closed over)."""
    def train_chunk(tree, opt_state, key, n):
        def step(carry, k):
            tree, opt_state = carry
            (loss, acc), grads = jax.value_and_grad(
                loss_of_params, has_aux=True)(tree, k)
            tree, opt_state = opt.update(grads, opt_state, tree)
            return (tree, opt_state), (loss, acc)
        keys = jax.random.split(key, n)
        (tree, opt_state), (losses, accs) = jax.lax.scan(
            step, (tree, opt_state), keys)
        return tree, opt_state, losses[-1], accs[-1]
    return jax.jit(train_chunk, static_argnums=(3,), donate_argnums=(0, 1))


def run_phase(name, chunk, tree, opt_state, steps, eval_fn, key,
              eval_every=100):
    done = 0
    t0 = time.perf_counter()
    acc = 0.0
    while done < steps:
        n = min(eval_every, steps - done)
        key, k1, k2 = jax.random.split(key, 3)
        tree, opt_state, loss, tacc = chunk(tree, opt_state, k1, n)
        done += n
        acc = float(eval_fn(tree, k2))
        print(f"{name} step {done:5d}  loss {float(loss):.4f}  "
              f"train acc {float(tacc):.3f}  eval acc {acc:.3f}",
              flush=True)
    print(f"{name}: {time.perf_counter() - t0:.1f}s")
    return tree, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--pretrain-steps", type=int, default=500)
    ap.add_argument("--finetune-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--length", type=int, default=15,
                    help="digits per sequence (S = 2*length + 2)")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lora-lr", type=float, default=2e-3)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--qlora", default="", choices=["", "int8", "nf4"],
                    help="quantize the frozen base to this format before "
                         "fine-tuning (QLoRA): adapters train in f32 on "
                         "top of quantized weights")
    args = ap.parse_args()

    enable_compilation_cache()
    ops.set_backend(args.backend)

    seq = 2 * args.length + 2
    vocab = sort_task_vocab()
    model = models.TinyGPT(
        vocab_size=vocab, dim=args.dim, depth=args.depth,
        num_heads=args.heads, max_seq=seq,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    params = model.init(jax.random.PRNGKey(0))
    n_base = model.param_count(params)
    print(f"TinyGPT dim={args.dim} depth={args.depth} S={seq} "
          f"params={n_base:,} backend={args.backend}")

    def loss_on(task_descending):
        def loss_of(tree, key):
            toks, tgts, mask = sort_task_batch(
                key, args.batch, args.length, descending=task_descending)
            return masked_token_loss(model.apply(tree, toks), tgts, mask)
        return loss_of

    # ---- 1. pretrain on ascending sort -------------------------------
    opt = optim.Adam(args.lr, weight_decay=0.0)
    chunk = make_chunk(opt, loss_on(False))
    eval_asc = jax.jit(lambda p, k: loss_on(False)(p, k)[1])
    eval_dsc = jax.jit(lambda p, k: loss_on(True)(p, k)[1])
    params, asc_acc = run_phase("pretrain", chunk, params, opt.init(params),
                                args.pretrain_steps, eval_asc,
                                jax.random.PRNGKey(1))

    base_dsc = float(eval_dsc(params, jax.random.PRNGKey(7)))
    print(f"task shift: ascending-model eval on DESCENDING sort: "
          f"{base_dsc:.3f} (chance ~0.1 + palindromic overlap)")

    # ---- 2. LoRA fine-tune on descending sort -------------------------
    base = params
    if args.qlora:
        from taper_tpu.quantization import ptq
        from taper_tpu.quantization.config import QuantizationConfig
        cfg = (QuantizationConfig.int8() if args.qlora == "int8"
               else QuantizationConfig.nf4())
        base = ptq.quantize_params(params, cfg)
        fb = ptq.quantized_bytes(base)
        print(f"QLoRA base: {args.qlora} storage {fb / 1e6:.2f} MB "
              f"(f32 would be {4 * n_base / 1e6:.2f} MB)")

    lora = LoRA(rank=args.rank, alpha=args.alpha)
    lp = lora.init(jax.random.PRNGKey(2), base)
    n_lora = lora.param_count(lp)
    print(f"LoRA rank={args.rank}: {n_lora:,} trainable params "
          f"({100.0 * n_lora / n_base:.2f}% of base)")

    dsc_loss = loss_on(True)
    def lora_loss(lp_, key):
        return dsc_loss(lora.patch(base, lp_), key)

    lopt = optim.Adam(args.lora_lr, weight_decay=0.0)
    lchunk = make_chunk(lopt, lora_loss)
    eval_lora = jax.jit(lambda lp_, k: lora_loss(lp_, k)[1])
    lp, ft_acc = run_phase("lora-ft", lchunk, lp, lopt.init(lp),
                           args.finetune_steps, eval_lora,
                           jax.random.PRNGKey(3))

    # base model is untouched: its ascending skill is preserved exactly
    asc_after = float(eval_asc(params, jax.random.PRNGKey(11)))
    print(f"base model ascending acc after fine-tune: {asc_after:.3f} "
          f"(unchanged — base weights were never written)")

    # ---- 3. merge for serving (dequantizes a QLoRA base) --------------
    merged = lora.merge(base, lp)
    key = jax.random.PRNGKey(13)
    toks, tgts, mask = sort_task_batch(key, args.batch, args.length,
                                       descending=True)
    patched_logits = model.apply(lora.patch(base, lp), toks)
    merged_logits = model.apply(merged, toks)
    err = float(jnp.max(jnp.abs(patched_logits - merged_logits)))
    macc = float(masked_token_loss(merged_logits, tgts, mask)[1])
    print(f"merged-vs-patched max |dlogit| = {err:.2e}; merged descending "
          f"acc {macc:.3f}")

    if ft_acc >= 0.95 and asc_acc >= 0.95:
        print("LoRA adaptation SOLVED (>=95% on both tasks, "
              f"{100.0 * n_lora / n_base:.2f}% params trained)")

    # ---- 4. multi-tenant serving: base + adapter in ONE batch ---------
    # The continuous-batching engine routes each request through its own
    # adapter (BankedLoRA rows): ascending requests on the BASE model,
    # descending requests on the fine-tuned adapter — sharing slots and
    # decode dispatches.  (A QLoRA base stays quantized; skip there —
    # the bank rides the float base.)
    if args.qlora:
        return
    from taper_tpu.serve import ServingEngine

    bank = lora.stack_adapters([lp])
    rng = np.random.default_rng(0)
    L = args.length          # the (learned-positional) training length
    eng = ServingEngine(model, params, slots=4, prompt_pad=L + 2,
                        decode_block=4, lora=lora, lora_bank=bank)
    reqs = []
    for i in range(6):
        digits = list(rng.integers(0, 10, L))
        prompt = [11] + digits + [10]            # [BOS] d.. [SEP]
        adapter = 0 if i % 2 else None           # even: base (asc)
        rid = eng.submit(prompt, max_new=L, adapter=adapter)
        reqs.append((rid, digits, adapter))
    out = eng.run()
    hit = tot = 0
    for rid, digits, adapter in reqs:
        want = sorted(digits, reverse=adapter is not None)
        hit += sum(a == b for a, b in zip(out[rid], want))
        tot += len(want)
    print(f"multi-tenant serving: {hit}/{tot} tokens correctly sorted "
          f"(base rows ASCENDING, adapter rows DESCENDING, one shared "
          f"decode batch — each request rode its own adapter)")


if __name__ == "__main__":
    main()
