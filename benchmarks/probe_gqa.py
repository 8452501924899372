"""Race: native-GQA flash attention vs repeat-then-flash.

The kernels read compact K/V heads via ``g // kvg`` index maps
(ops/pallas/attention.py) instead of materializing
``jnp.repeat(k, groups, axis=1)`` in HBM.  What the repeat costs:

* forward: one extra HBM round-trip of (groups−1)/groups of the
  repeated K/V (the repeat writes B·Hq·S·D where only B·Hkv·S·D is
  real), plus the same again when the flash kernel reads it;
* backward: the repeated K/V are the residuals, so the write+read
  happens again, and the repeat VJP adds a group-sum pass (which the
  native path also pays, as the explicit f32 group-sum of dK/dV).

Run on a real TPU: ``python benchmarks/probe_gqa.py``.

Shapes: llama-8B-ish attention slice (Hq=32 grouped 4:1 onto Hkv=8 at
D=128) scaled to one v5e chip, bf16, S=2048.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import importlib

from benchmarks.timing import Contender, race
from taper_tpu.utils.cache import enable_compilation_cache

# the package re-exports the `attention` FUNCTION under the module name
A = importlib.import_module("taper_tpu.ops.pallas.attention")

enable_compilation_cache()


def main(b=4, hq=16, hkv=4, s=2048, d=128, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, hq, s, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, s, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, s, d), dtype)
    g = hq // hkv
    print(f"B={b} Hq={hq} Hkv={hkv} S={s} D={d} {jnp.dtype(dtype).name} "
          f"(groups={g})")

    def fwd_native(c, k, v):
        return A.flash_attention(c, k, v, True)

    def fwd_repeat(c, k, v):
        kr = jnp.repeat(k, g, axis=1)
        vr = jnp.repeat(v, g, axis=1)
        return A.flash_attention(c, kr, vr, True)

    # fwd: chain on q (output has q's shape)
    print("forward:")
    race([
        Contender("flash GQA native", fwd_native, q, (k, v), n_hi=40,
                  n_lo=8),
        Contender("flash repeat-KV", fwd_repeat, q, (k, v), n_hi=40,
                  n_lo=8),
    ], scale=4 * b * hq * s * s * d / 2 / 1e12,
        unit="TFLOP/s(eff)")

    # fwd+bwd: chain on q via dq AND fold dk/dv into the carry — grad
    # w.r.t. q only would let jit dead-code-eliminate the dK/dV kernel,
    # the GQA group-sum, and the repeat contender's repeat-VJP, turning
    # this into a fwd+dQ race with a misleading label.
    def fb(f):
        def step(c, k, v):
            dq, dk, dv = jax.grad(
                lambda q, k, v: jnp.sum(
                    f(q, k, v).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2))(c, k, v)
            mix = (jnp.sum(dk.astype(jnp.float32))
                   + jnp.sum(dv.astype(jnp.float32)))
            return (c + 0.01 * dq.astype(c.dtype)
                    + (0.0 * mix).astype(c.dtype)).astype(c.dtype)
        return step

    print("forward+backward(dq,dk,dv):")
    race([
        Contender("flash GQA native", fb(fwd_native), q, (k, v),
                  n_hi=24, n_lo=6),
        Contender("flash repeat-KV", fb(fwd_repeat), q, (k, v),
                  n_hi=24, n_lo=6),
    ], scale=10 * b * hq * s * s * d / 2 / 1e12,
        unit="TFLOP/s(eff)")


if __name__ == "__main__":
    main()
