"""Flash attention vs XLA attention on the v5e (interleaved races).

Three rows per shape: forward-only, and a full fwd+bwd step (grad wrt
q/k/v).  XLA materializes the [B,H,S,S] score matrix in HBM, so its time
scales O(S^2) in memory traffic; the flash kernel is O(S*D).

Run: python benchmarks/bench_attention.py [bf16]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops import xla as X                        # noqa: E402
from taper_tpu.ops.pallas.attention import flash_attention  # noqa: E402
from benchmarks.timing import Contender, race            # noqa: E402


SHAPES = [
    # (B, H, S, D)
    (4, 8, 512, 64),
    (4, 8, 1024, 64),
    (4, 8, 2048, 64),
    (2, 8, 4096, 64),
    (2, 8, 2048, 128),
]


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    causal = True
    for b, h, s, d in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        q, k, v = (jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)
        # causal: half the S^2 work
        flops = 4.0 * b * h * s * s * d / 2

        def xla_fwd(qc, kc, vc):
            y = X.attention(qc, kc, vc, causal=causal)
            return qc + 0.001 * y

        def fl_fwd(qc, kc, vc):
            y = flash_attention(qc, kc, vc, causal)
            return qc + 0.001 * y

        def xla_step(qc, kc, vc):
            g = jax.grad(lambda a: jnp.sum(
                X.attention(a, kc, vc, causal=causal)
                .astype(jnp.float32)))(qc)
            return qc + 0.001 * g.astype(qc.dtype)

        def fl_step(qc, kc, vc):
            g = jax.grad(lambda a: jnp.sum(
                flash_attention(a, kc, vc, causal)
                .astype(jnp.float32)))(qc)
            return qc + 0.001 * g.astype(qc.dtype)

        err = float(jnp.max(jnp.abs(
            (X.attention(q, k, v, causal=causal)
             - flash_attention(q, k, v, causal)).astype(jnp.float32))))
        print(f"B{b} H{h} S{s} D{d} {dtype.__name__} causal "
              f"(maxerr {err:.1e})", flush=True)
        race([
            Contender("xla fwd", xla_fwd, q, (k, v), n_hi=60, n_lo=10),
            Contender("flash fwd", fl_fwd, q, (k, v), n_hi=60, n_lo=10),
            Contender("xla fwd+bwd", xla_step, q, (k, v), n_hi=60,
                      n_lo=10),
            Contender("flash fwd+bwd", fl_step, q, (k, v), n_hi=60,
                      n_lo=10),
        ], rounds=3, scale=flops / 1e12, unit="TFLOP/s")


if __name__ == "__main__" and "e2e" not in sys.argv[1:]:
    main()


def e2e():
    """Full TinyGPT train step (fwd+bwd+Adam), flash vs oracle attention,
    raced in ONE process (source edits / process drift otherwise dominate
    staggered comparisons).  bf16 trunk, attention-heavy config."""
    import jax.numpy as jnp

    from taper_tpu import models, optim, ops
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    b, length = 8, 1023                      # S = 2048
    seq = 2 * length + 2
    model = models.TinyGPT(vocab_size=12, dim=256, depth=2, num_heads=4,
                           max_seq=seq, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(1e-3)
    state0 = opt.init(params)
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), b, length)

    def make_step(backend):
        def step(carry, toks, tgts):
            params, state = carry
            ops.set_backend(backend)    # trace-time switch
            def loss_of(p):
                return masked_token_loss(model.apply(p, toks), tgts,
                                         mask)[0]
            loss, grads = jax.value_and_grad(loss_of)(params)
            params, state = opt.update(grads, state, params)
            return (params, state)
        return step

    toks_per_step = b * seq
    cs = [Contender("xla-attn step", make_step("xla"), (params, state0),
                    (toks, tgts), n_hi=30, n_lo=5),
          Contender("flash-attn step", make_step("pallas"),
                    (params, state0), (toks, tgts), n_hi=30, n_lo=5)]
    race(cs, rounds=3, scale=toks_per_step, unit="tokens/s")


if __name__ == "__main__" and "e2e" in sys.argv[1:]:
    e2e()
    sys.exit(0)
