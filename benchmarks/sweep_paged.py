"""Sweep the paged flash-decode kernel's nsub (pool blocks per grid
step) against the XLA gather oracle, at the serving sweet spot
(16 slots, 8 kvh, G=4, D=128, bs=128, 4K max tokens, bf16), under
mixed (256/4032), all-long and all-short true lengths.

Active-bytes roofline context (VERDICT r4 item 7): at the 256/4032 mix
~53% of the pool bytes are live, so the kernel's floor is ~0.53× the
all-long time — grid-step overhead on the skipped steps is the only
recoverable cost beyond that.

Run: python benchmarks/sweep_paged.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from benchmarks.timing import Contender, race              # noqa: E402
from taper_tpu.ops.pallas import paged_attention as P      # noqa: E402


def main():
    b, kvh, g, d = 16, 8, 4, 128
    bs, smax = 128, 4096
    mb = smax // bs
    nblocks = b * mb + 1
    rng = np.random.default_rng(0)
    kq = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq[0], (b, kvh, g, d), jnp.bfloat16)
    k_pool = jax.random.normal(kq[1], (nblocks, kvh, bs, d),
                               jnp.bfloat16)
    v_pool = jax.random.normal(kq[2], (nblocks, kvh, bs, d),
                               jnp.bfloat16)
    perm = rng.permutation(b * mb).reshape(b, mb) + 1
    tables = jnp.asarray(perm, jnp.int32)
    scale = d ** -0.5

    # int8 pools + per-position scales (the serving int8-KV form)
    k8 = jnp.clip(jnp.round(k_pool.astype(jnp.float32) * 127 / 4), -127,
                  127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v_pool.astype(jnp.float32) * 127 / 4), -127,
                  127).astype(jnp.int8)
    ksc = jnp.full((nblocks, kvh, bs), 4 / 127, jnp.float32)

    mixes = {
        "mixed": jnp.asarray([256, 4032] * (b // 2), jnp.int32),
        "all-long": jnp.full((b,), smax, jnp.int32),
        "all-short": jnp.full((b,), 256, jnp.int32),
    }
    for name, lengths in mixes.items():
        # pools/tables/lengths ride as jit ARGUMENTS via consts —
        # closure capture would constant-fold the 134MB pool into the
        # HLO and blow the remote compiler's upload limit (timing.py)
        consts = (k_pool, v_pool, tables, lengths)
        consts8 = (k8, v8, tables, lengths, ksc)

        def xla(qc, kp, vp, tb, ln):
            return qc + 0.001 * P.paged_decode_attention(
                qc, kp, vp, tb, ln, scale=scale, impl="xla")
        cs = [Contender("xla gather", xla, q, consts, n_hi=60, n_lo=10)]
        for nsub in (2, 4, 8, 16):
            def pk(qc, kp, vp, tb, ln, nsub=nsub):
                return qc + 0.001 * P.paged_decode_attention(
                    qc, kp, vp, tb, ln, scale=scale,
                    impl="pallas", nsub=nsub)
            cs.append(Contender(f"pallas nsub={nsub}", pk, q, consts,
                                n_hi=60, n_lo=10))
        for nsub in (2, 4, 8):
            def pk8(qc, kp, vp, tb, ln, sc, nsub=nsub):
                return qc + 0.001 * P.paged_decode_attention(
                    qc, kp, vp, tb, ln, scale=scale, impl="pallas",
                    nsub=nsub, k_scales=sc, v_scales=sc)
            cs.append(Contender(f"pallas int8 nsub={nsub}", pk8, q,
                                consts8, n_hi=60, n_lo=10))
        print(f"--- {name} ---", flush=True)
        # pre-warm and DROP contenders whose compile fails (nsub=2 at
        # B=16 puts 16.09 MB of pipelined pool blocks on the VMEM
        # stack, 96 KB over the 16 MB scoped limit) so one bad point
        # doesn't kill the whole sweep
        ok = []
        for c in cs:
            try:
                c.warm()
                ok.append(c)
            except Exception as e:
                print(f"  {c.name:42s} SKIPPED "
                      f"({type(e).__name__}: {str(e)[:80]}...)",
                      flush=True)
        race(ok, rounds=3, scale=None, unit="s")


if __name__ == "__main__":
    main()
