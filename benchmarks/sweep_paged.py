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
        print(f"--- {name} ---", flush=True)
        race(cs, rounds=3, scale=None, unit="s")


if __name__ == "__main__":
    main()
