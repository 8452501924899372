"""Shared TPU timing harness for the benchmark scripts.

Methodology (this environment's device proxy makes ``block_until_ready``
unreliable and adds a host round-trip per jit call): each kernel is
iterated inside ONE compiled ``lax.scan`` with a data dependency between
iterations, and the wall-time difference between a long and a short run
divides out per-call/transfer constants:

    t_kernel = (t(n_hi iters) − t(n_lo iters)) / (n_hi − n_lo)

Fast kernels (<~200µs/iter) need long chains (n_hi≈200) or the difference
sinks below the tunnel's noise floor (symptom: absurd TFLOP/s).  Device
throughput also drifts ±15% between processes/minutes, so comparisons are
only meaningful INTERLEAVED within one process — use :func:`race`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def run_once(jp, init, n, consts=()):
    t0 = time.perf_counter()
    out = jp(init, n, *consts)
    # force real materialization (block_until_ready is unreliable here)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]))
    return time.perf_counter() - t0


def timeit_scan(step, init, consts=(), n_hi=60, n_lo=10, reps=3):
    """Per-iteration seconds of ``step`` chained inside one scan program.

    ``consts`` are threaded as jit ARGUMENTS — closure-captured arrays
    would be constant-folded into the HLO (a 256 MB weight blows the
    remote compiler's upload limit)."""
    def prog(c, n, *cs):
        return jax.lax.scan(lambda c, _: (step(c, *cs), None), c, None,
                            length=n)[0]
    jp = jax.jit(prog, static_argnums=(1,))
    run_once(jp, init, n_lo, consts)   # compile both lengths
    run_once(jp, init, n_hi, consts)
    t_lo = min(run_once(jp, init, n_lo, consts) for _ in range(reps))
    t_hi = min(run_once(jp, init, n_hi, consts) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


class Contender:
    """One participant in an interleaved A/B race."""

    def __init__(self, name, step, init, consts=(), n_hi=60, n_lo=10,
                 scale=None):
        self.name = name
        self.scale = scale      # per-contender override of race(scale=)
        self.init, self.consts = init, consts
        self.n_hi, self.n_lo = n_hi, n_lo

        def prog(c, n, *cs):
            return jax.lax.scan(lambda c, _: (step(c, *cs), None), c, None,
                                length=n)[0]
        self.jp = jax.jit(prog, static_argnums=(1,))
        self.t_lo, self.t_hi = [], []

    def warm(self):
        run_once(self.jp, self.init, self.n_lo, self.consts)
        run_once(self.jp, self.init, self.n_hi, self.consts)

    def measure(self):
        self.t_lo.append(run_once(self.jp, self.init, self.n_lo,
                                  self.consts))
        self.t_hi.append(run_once(self.jp, self.init, self.n_hi,
                                  self.consts))

    def per_iter(self):
        return max(min(self.t_hi) - min(self.t_lo), 1e-9) / (
            self.n_hi - self.n_lo)


def race(contenders, rounds=4, scale=None, unit=""):
    """Measure contenders ALTERNATING over several rounds; print best."""
    for c in contenders:
        c.warm()
    for _ in range(rounds):
        for c in contenders:
            c.measure()
    for c in contenders:
        t = c.per_iter()
        sc = c.scale if c.scale is not None else scale
        val = sc / t if sc else t * 1e3
        print(f"  {c.name:42s} {val:9.1f} {unit} ({t*1e6:.0f}us)",
              flush=True)
