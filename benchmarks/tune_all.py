"""Interleaved A/B kernel tuning on the v5e.

Device throughput drifts ±20% between processes/minutes here, so contenders
are measured ALTERNATING within one process and compared by their best
per-iteration time; the scan-difference methodology (see kernels.py) still
cancels per-call host-tunnel constants.

Run: python benchmarks/tune_all.py [gemm|q8|adam]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from taper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from taper_tpu.ops.pallas import gemm as G      # noqa: E402
from taper_tpu.ops.pallas import quant as Q     # noqa: E402
from taper_tpu.ops.pallas import optim_kernels as OK  # noqa: E402
from taper_tpu.ops import xla as X              # noqa: E402
from taper_tpu.quantization.config import QuantizationConfig  # noqa: E402
from taper_tpu.quantization.qtensor import quantize  # noqa: E402


def _run(jp, init, n, consts):
    t0 = time.perf_counter()
    out = jp(init, n, *consts)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]))
    return time.perf_counter() - t0


class Contender:
    def __init__(self, name, step, init, consts=(), n_hi=60, n_lo=10):
        self.name = name
        self.init, self.consts = init, consts
        self.n_hi, self.n_lo = n_hi, n_lo

        def prog(c, n, *cs):
            return jax.lax.scan(lambda c, _: (step(c, *cs), None), c, None,
                                length=n)[0]
        self.jp = jax.jit(prog, static_argnums=(1,))
        self.t_lo, self.t_hi = [], []

    def warm(self):
        _run(self.jp, self.init, self.n_lo, self.consts)
        _run(self.jp, self.init, self.n_hi, self.consts)

    def measure(self):
        self.t_lo.append(_run(self.jp, self.init, self.n_lo, self.consts))
        self.t_hi.append(_run(self.jp, self.init, self.n_hi, self.consts))

    def per_iter(self):
        return max(min(self.t_hi) - min(self.t_lo), 1e-9) / (
            self.n_hi - self.n_lo)


def race(contenders, rounds=4, scale=None, unit=""):
    for c in contenders:
        c.warm()
    for _ in range(rounds):
        for c in contenders:
            c.measure()
    for c in contenders:
        t = c.per_iter()
        val = scale / t if scale else t * 1e3
        print(f"  {c.name:42s} {val:9.1f} {unit} ({t*1e6:.0f}us)",
              flush=True)


def gemm():
    key = jax.random.PRNGKey(0)
    M = N = K = 4096
    a = jax.random.normal(key, (M, K)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(1), (N, K)) * 0.01
    bias = jnp.zeros((N,))
    flops = 2.0 * M * N * K

    def pallas_blocks(blocks, has_bias):
        def step(c, w, bb):
            G._BLOCK_OVERRIDE["blocks"] = blocks
            try:
                if has_bias:
                    return G._gemm(c, w, bb, epilogue="none",
                                   has_bias=True, mode="nt") * 1e-2
                return G._gemm(c, w, None, has_bias=False,
                               mode="nt") * 1e-2
            finally:
                G._BLOCK_OVERRIDE["blocks"] = None
        return step

    cs = [
        Contender("xla linear bias", lambda c, w, bb: X.linear(
            c, w, bb) * 1e-2, a, (b, bias)),
        Contender("pallas (1024,1024,256) bias",
                  pallas_blocks((1024, 1024, 256), True), a, (b, bias)),
        Contender("pallas (1024,1024,256) nobias",
                  pallas_blocks((1024, 1024, 256), False), a, (b, bias)),
        Contender("pallas (512,1024,512) bias",
                  pallas_blocks((512, 1024, 512), True), a, (b, bias)),
        Contender("pallas (1024,1024,512) bias",
                  pallas_blocks((1024, 1024, 512), True), a, (b, bias)),
        Contender("pallas (1024,1024,128) bias",
                  pallas_blocks((1024, 1024, 128), True), a, (b, bias)),
    ]
    race(cs, scale=flops / 1e12, unit="tflops")


def q8():
    key = jax.random.PRNGKey(0)
    Ms, Ns, Ks = 128, 8192, 8192
    xs = jax.random.normal(key, (Ms, Ks)) * 0.01
    ws = jax.random.normal(jax.random.PRNGKey(3), (Ns, Ks)) * 0.01
    bs = jnp.zeros((Ns,))
    flops = 2.0 * Ms * Ns * Ks
    qt = quantize(ws, QuantizationConfig.int8())

    def _chain(y):
        return y[:, :Ks] * 1e-2

    def pallas_blocks(blocks):
        def step(c, qv, sc, zp, bb):
            Q._BLOCK_OVERRIDE["blocks"] = blocks
            try:
                return _chain(Q.linear_q8(c, qv, sc, zp, bb))
            finally:
                Q._BLOCK_OVERRIDE["blocks"] = None
        return step

    def xla_deq(c, qv, sc, zp, bb):
        w = (qv.astype(jnp.float32) - zp.astype(jnp.float32)) * sc
        return _chain(X.linear(c, w, bb))

    consts = (qt.values, qt.scale, qt.zero_point, bs)
    cs = [
        Contender("xla fused dequant serve", xla_deq, xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,8192,256)",
                  pallas_blocks((128, 8192, 256)), xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,8192,128)",
                  pallas_blocks((128, 8192, 128)), xs, consts,
                  n_hi=200, n_lo=40),
        Contender("pallas q8 (128,4096,256)",
                  pallas_blocks((128, 4096, 256)), xs, consts,
                  n_hi=200, n_lo=40),
    ]
    race(cs, scale=flops / 1e12, unit="tflops")


def adam():
    key = jax.random.PRNGKey(0)
    n = 25_000_000
    p0 = jax.random.normal(key, (n,)) * 0.01
    g0 = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.01
    gb = n * 4 * 6 / 1e9
    init = (p0, jnp.zeros(n), jnp.zeros(n))

    def pallas_rows(rows, sem):
        def step(c, g):
            old_r, old_s = OK._BLOCK_ROWS, OK._SEMANTICS
            OK._BLOCK_ROWS, OK._SEMANTICS = rows, sem
            try:
                p, m, v = c
                return OK.adam_update_flat(
                    p, g, m, v, None, jnp.float32(1e-3), jnp.float32(10.0),
                    b1=0.9, b2=0.999, eps=1e-8, wd=1e-2, decoupled=True)
            finally:
                OK._BLOCK_ROWS, OK._SEMANTICS = old_r, old_s
        return step

    def xla_adam(c, g):
        p, m, v = c
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        step = 1e-3 * jnp.sqrt(1 - 0.999 ** 10.0) / (1 - 0.9 ** 10.0)
        p = p * (1 - 1e-3 * 1e-2) - step * m / (jnp.sqrt(v) + 1e-8)
        return (p, m, v)

    # experimental raw variants
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def raw_variant(rows, lanes, alias, sem):
        total = n // lanes  # n divisible by 128*lanes for n=25M? pad below

        def step(c, g):
            p, m, v = c
            nel = p.shape[0]
            r = -(-nel // lanes)
            r = -(-r // 8) * 8
            pt = jnp.pad(p, (0, r * lanes - nel)).reshape(r, lanes)
            gt = jnp.pad(g, (0, r * lanes - nel)).reshape(r, lanes)
            mt = jnp.pad(m, (0, r * lanes - nel)).reshape(r, lanes)
            vt = jnp.pad(v, (0, r * lanes - nel)).reshape(r, lanes)
            br = min(rows, r)
            spec = pl.BlockSpec((br, lanes), lambda i: (i, 0))

            def kern(p_ref, g_ref, m_ref, v_ref, po, mo, vo):
                g_ = g_ref[:]
                m_ = 0.9 * m_ref[:] + 0.1 * g_
                v_ = 0.999 * v_ref[:] + 0.001 * g_ * g_
                p_ = p_ref[:] * (1 - 1e-3 * 1e-2)
                po[:] = p_ - 1e-3 * m_ / (jnp.sqrt(v_) + 1e-8)
                mo[:] = m_
                vo[:] = v_

            kwargs = {}
            if alias:
                kwargs["input_output_aliases"] = {0: 0, 2: 1, 3: 2}
            po, mo, vo = pl.pallas_call(
                kern,
                grid=(-(-r // br),),
                in_specs=[spec] * 4,
                out_specs=(spec, spec, spec),
                out_shape=tuple(jax.ShapeDtypeStruct((r, lanes),
                                                     jnp.float32)
                                for _ in range(3)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem,)),
                **kwargs,
            )(pt, gt, mt, vt)
            fl = lambda a: a.reshape(-1)[:nel]
            return (fl(po), fl(mo), fl(vo))
        return step

    def manual_variant(br):
        lanes = 128

        def step(c, g):
            p, m, v = c
            nel = p.shape[0]
            r = -(-nel // lanes)
            r = -(-r // br) * br
            pt = jnp.pad(p, (0, r * lanes - nel)).reshape(r, lanes)
            gt = jnp.pad(g, (0, r * lanes - nel)).reshape(r, lanes)
            mt = jnp.pad(m, (0, r * lanes - nel)).reshape(r, lanes)
            vt = jnp.pad(v, (0, r * lanes - nel)).reshape(r, lanes)
            n_chunks = r // br

            def kern(p_h, g_h, m_h, v_h, po_h, mo_h, vo_h):
                def body(ins, outs, in_sems, out_sems):
                    h_in = (p_h, g_h, m_h, v_h)
                    h_out = (po_h, mo_h, vo_h)

                    def in_dma(slot, idx, s):
                        return pltpu.make_async_copy(
                            h_in[s].at[pl.ds(idx * br, br), :],
                            ins.at[slot, s], in_sems.at[slot, s])

                    def out_dma(slot, idx, s):
                        return pltpu.make_async_copy(
                            outs.at[slot, s],
                            h_out[s].at[pl.ds(idx * br, br), :],
                            out_sems.at[slot, s])

                    for s in range(4):
                        in_dma(0, 0, s).start()

                    def loop(i, carry):
                        slot = jax.lax.rem(i, 2)
                        nxt = jax.lax.rem(i + 1, 2)

                        @pl.when(i + 1 < n_chunks)
                        def _():
                            for s in range(4):
                                in_dma(nxt, i + 1, s).start()

                        for s in range(4):
                            in_dma(slot, i, s).wait()

                        @pl.when(i >= 2)
                        def _():
                            for s in range(3):
                                out_dma(slot, i - 2, s).wait()

                        g_ = ins[slot, 1]
                        m_ = 0.9 * ins[slot, 2] + 0.1 * g_
                        v_ = 0.999 * ins[slot, 3] + 0.001 * g_ * g_
                        p_ = ins[slot, 0] * (1 - 1e-3 * 1e-2)
                        outs[slot, 0] = p_ - 1e-3 * m_ / (
                            jnp.sqrt(v_) + 1e-8)
                        outs[slot, 1] = m_
                        outs[slot, 2] = v_
                        for s in range(3):
                            out_dma(slot, i, s).start()
                        return carry

                    jax.lax.fori_loop(0, n_chunks, loop, 0)
                    for idx in (n_chunks - 2, n_chunks - 1):
                        if idx >= 0:
                            for s in range(3):
                                out_dma(idx % 2, idx, s).wait()

                pl.run_scoped(
                    body,
                    ins=pltpu.VMEM((2, 4, br, lanes), jnp.float32),
                    outs=pltpu.VMEM((2, 3, br, lanes), jnp.float32),
                    in_sems=pltpu.SemaphoreType.DMA((2, 4)),
                    out_sems=pltpu.SemaphoreType.DMA((2, 3)),
                )

            spec = pl.BlockSpec(memory_space=pltpu.ANY)
            po, mo, vo = pl.pallas_call(
                kern,
                in_specs=[spec] * 4,
                out_specs=(spec, spec, spec),
                out_shape=tuple(jax.ShapeDtypeStruct((r, lanes),
                                                     jnp.float32)
                                for _ in range(3)),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(pt, gt, mt, vt)
            fl = lambda a: a.reshape(-1)[:nel]
            return (fl(po), fl(mo), fl(vo))
        return step

    cs = [Contender("xla adamw", xla_adam, init, (g0,)),
          Contender("pallas lib rows=2048", pallas_rows(2048, "arbitrary"),
                    init, (g0,)),
          Contender("manual dma br=1024", manual_variant(1024),
                    init, (g0,)),
          Contender("manual dma br=512", manual_variant(512),
                    init, (g0,)),
          Contender("manual dma br=256", manual_variant(256),
                    init, (g0,))]
    cs.append(Contender(
        "raw rows=1024 lanes=128 alias=0 arb",
        raw_variant(1024, 128, False, "arbitrary"), init, (g0,)))
    race(cs, scale=gb, unit="GB/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gemm"
    {"gemm": gemm, "q8": q8, "adam": adam}[which]()
