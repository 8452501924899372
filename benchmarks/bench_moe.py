"""Sparse (capacity-routed) vs dense MoE dispatch cost, raced in one
process.

Dense dispatch runs every expert on every token: compute scales with
n_experts.  Sparse dispatch gathers each expert's capacity buffer
(C = top_k·T/n · f), so expert FLOPs scale with top_k·f — n_experts=8 /
top_k=2 should cost ≈ 2·f experts, not 8.  The "2 experts dense" row is
the lower-bound oracle (same FLOPs as ideal top-2-of-8 routing, no
dispatch overhead).

Run: python benchmarks/bench_moe.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.nn.transformer import MoEMLP          # noqa: E402
from benchmarks.timing import Contender, race        # noqa: E402


def main():
    b, s, dim, ratio = 8, 2048, 512, 4
    n, k = 8, 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, dim), jnp.bfloat16)

    dense = MoEMLP(dim, n_experts=n, ratio=ratio, top_k=k)
    sparse = MoEMLP(dim, n_experts=n, ratio=ratio, top_k=k,
                    capacity_factor=1.25)
    two = MoEMLP(dim, n_experts=k, ratio=ratio, top_k=k)
    params = dense.init(jax.random.PRNGKey(1))
    params2 = two.init(jax.random.PRNGKey(1))

    def step_of(moe):
        def step(xc, p):
            return xc + 0.1 * moe.apply(p, xc).astype(xc.dtype)
        return step

    toks = b * s
    print(f"B{b} S{s} dim{dim} ratio{ratio} n_experts={n} top_k={k} "
          f"bf16", flush=True)
    race([
        Contender(f"dense {n} experts", step_of(dense), x, (params,),
                  n_hi=30, n_lo=5),
        Contender(f"sparse top-{k} (f=1.25)", step_of(sparse), x,
                  (params,), n_hi=30, n_lo=5),
        Contender(f"dense {k} experts (oracle)", step_of(two), x,
                  (params2,), n_hi=30, n_lo=5),
    ], rounds=3, scale=toks, unit="tokens/s")


if __name__ == "__main__":
    main()
