"""Probe: fused (chunked) linear+CE vs naive [N, V] head, real chip.

Races the full loss+grad step (value_and_grad wrt hidden states AND the
head weight) at LM-serving-relevant vocab sizes.  The fused path does
~2x the head FLOPs (backward recompute) but never writes the [N, V]
logits/softmax buffers to HBM; the naive path materializes them in both
passes.  Crossover is where saved HBM traffic beats the extra MXU work
— plus the memory headroom: at the largest shape below the naive
backward allocates N*V*4 * ~3 buffers, which OOMs before the fused one.

Run: python benchmarks/probe_fused_ce.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from benchmarks.timing import Contender, race
from taper_tpu.losses import fused_linear_cross_entropy


def naive_nll(x, head, tgt):
    logits = x @ head.T
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]


def main():
    n, d = 4096, 1024
    key = jax.random.PRNGKey(0)

    for v in (8192, 32768, 131072):
        kx, kh, kt = jax.random.split(jax.random.fold_in(key, v), 3)
        x0 = jax.random.normal(kx, (n, d), jnp.float32) * 0.1
        head = jax.random.normal(kh, (v, d), jnp.float32) * 0.02
        tgt = jax.random.randint(kt, (n,), 0, v, jnp.int32)

        def naive_step(x, head, tgt):
            l, (gx, gh) = jax.value_and_grad(
                lambda x, h: jnp.mean(naive_nll(x, h, tgt)),
                argnums=(0, 1))(x, head)
            # fold grads back in so the scan chains on everything
            return x - 1e-6 * gx, head - 1e-6 * gh

        def fused_step(chunk, x, head, tgt):
            l, (gx, gh) = jax.value_and_grad(
                lambda x, h: jnp.mean(fused_linear_cross_entropy(
                    x, h, tgt, chunk=chunk)[0]), argnums=(0, 1))(x, head)
            return x - 1e-6 * gx, head - 1e-6 * gh

        # logits+softmax+grad buffers, f32: ~3 live N*V copies
        naive_gb = 3 * n * v * 4 / 2**30
        print(f"V={v} (N={n}, D={d}; naive transient ~{naive_gb:.1f} GB)",
              flush=True)
        cs = [Contender(f"fused chunk={c}",
                        lambda carry, tgt, c=c: fused_step(
                            c, carry[0], carry[1], tgt),
                        (x0, head), consts=(tgt,), n_hi=12, n_lo=3)
              for c in (4096, 8192, 16384)]
        if naive_gb < 6.0:   # keep the naive contender under HBM
            cs.insert(0, Contender(
                "naive [N,V] logits",
                lambda carry, tgt: naive_step(carry[0], carry[1], tgt),
                (x0, head), consts=(tgt,), n_hi=12, n_lo=3))
        else:
            print("  naive [N,V] logits: skipped (would exceed HBM "
                  "headroom with 3 transient N*V buffers)", flush=True)
        race(cs, rounds=3)


if __name__ == "__main__":
    main()
