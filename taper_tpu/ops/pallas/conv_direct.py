"""Direct (implicit-im2col) Pallas convolution for stride-1 convs.

The round-1 design materialized the ``[N·Ho·Wo, C·kh·kw]`` patch matrix in
HBM before the GEMM — kh·kw× the input bytes of HBM traffic, which is why
every small-K conv delegated to XLA.  This kernel builds the patch tile
**in VMEM inside the grid** instead (the TPU analogue of the reference's
direct 3×3 kernel, ``src/tensor.rs:1287-1376``, and its rayon-specialized
3×3 im2col, ``:1728-1780``):

* the input block ``[nb, Hp, Wp, C]`` (NHWC, pre-padded) is DMA'd to VMEM
  once per grid step;
* kh·kw static tap slices assemble the patch scratch
  ``[nb, Ho, Wo, C·kh·kw]`` with VPU copies (VMEM↔VMEM, ~free vs HBM);
* ONE MXU ``dot`` per block contracts the taps against the flattened
  weights, with bias + ReLU/sigmoid fused into the epilogue.

HBM traffic is input-once + output-once — the roofline for a conv.

Backward (full custom VJP, unlike the reference's severed conv grads):

* ``dx`` is the same kernel run on the output cotangent with spatially
  flipped, in/out-swapped weights and complementary padding (a stride-1
  transposed conv IS a conv);
* ``dw`` accumulates per-tap patchᵀ·cotangent products into a ``[K, O]``
  block revisited across the batch grid.

**Measured standing vs XLA's native conv (v5e, interleaved races,
benchmarks/tune_all.py methodology):** XLA's convolution emitter — which
performs implicit windowing in its own internal tiled layouts without ever
materializing patches OR lane-padding C=32 feature dims — runs the MNIST
CNN conv shapes at 18-41us; this kernel measures 117-1469us, bottlenecked
by the VPU relayout copies that assemble the patch scratch when C < 128
lanes (a DMA-based assembly is rejected by the hardware's 128-lane slice
alignment).  At lane-aligned C the relayout cost collapses as predicted —
55-80 TFLOP/s at C ∈ {128, 256} (``benchmarks/probe_conv_c128.py``) —
but XLA's emitter still wins ~3× there (206-217 effective), so since
round 3 the pallas backend's DEFAULT dispatch routes stride-1 convs to
the emitter and ``TAPER_CONV=direct`` opts into the all-kernels mode
(round 1's silent delegation hid the gap; the dispatch now names it).

**Formulation study (why this gap is structural, not a tuning miss —
probes in ``benchmarks/probe_conv_split.py`` / ``proto_conv_taps.py``,
conv 32→32 28×28 batch 256):**

* split probe: assembly-only = 783us of the full kernel's 900us (87%);
  the f32 MXU dot accounts for ~120us; a bf16-input dot changes nothing
  (the kernel is relayout-bound, not MXU-bound); a dot over a
  pre-materialized HBM patch matrix is WORSE (1395us — 231 MB of HBM
  reads), re-confirming in-VMEM assembly over round 1's materialization.
* tap decomposition (no patch scratch at all: y += dot(x[:, i:i+ho,
  j:j+wo, :].reshape(R, C), W_tap) — slices move sublanes only, lanes
  stay = C): 1234us.  Assembly relayout is gone but each of the kh·kw
  dots pads K=C=32 to the 128-lane MXU contraction, so the MXU does 4x
  the work at 1/3 f32 pass rate — the waste just moves from the VPU to
  the MXU.  (For C == 1 a pure-VPU broadcast-FMA tap variant is exact
  f32 — 2.5e-8 vs a float64 reference, where XLA's emitter shows 6e-4
  single-pass-bf16 error — but is equally slow, 876us.)
* CHWN batch-on-lanes taps (``benchmarks/proto_conv_chwn.py``: Mosaic's
  multi-dim dot_general contracts C directly against (C, h, w, N) tiles
  — no reshape, no relayout, halo bands pre-materialized): the best
  hand formulation at small C — 141us vs this kernel's 1589us at CIFAR
  16ch 32x32 (11x), 508 vs 898us at conv 32→32 — but still 8-23x behind
  XLA's emitter, bounded by the same K=C<128 MXU padding, and it needs
  a CHWN activation layout the rest of the network doesn't use (the
  NCHW↔CHWN transposes at the conv boundary cost more than the win).
* the structural dead end: a 2D MXU dot contracts over [lanes of A] x
  [sublanes of B], and the im2col axis (c, kh, kw) mixes the channel
  (lane) dim with spatial-shift (sublane) dims.  Every layout assignment
  therefore either interleaves lanes during assembly (relayout), makes
  K=C alone (MXU padding waste at C<128), or reshapes major dims onto
  lanes at dot time.  XLA's conv emitter sidesteps the trilemma with
  windowed MXU feeds that Mosaic does not expose to custom kernels.
  Hence the dispatch knob: hand kernels where they win (GEMM, int8/int4
  serving, attention), XLA's emitter where it is provably unreachable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taper_tpu.ops import backend as _backend

# Total VMEM budget per grid step (patch scratch + pipelined blocks).
_P_BUDGET = 10 * 2 ** 20


def _ru(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _phys(rows: int, cols: int) -> int:
    """Physical f32 bytes of a VMEM tile — sublanes round to 8, lanes to
    128 (narrow minor dims are lane-padded on chip)."""
    return _ru(rows, 8) * _ru(cols, 128) * 4


def _pick_nb(n: int, ho: int, wo: int, k: int, hp: int, wp: int,
             c: int, o: int) -> int:
    """Images per grid step: fit patch scratch + double-buffered input and
    output blocks in the VMEM budget, at physically padded sizes."""
    import math

    per_p = ho * _phys(wo, k)
    per_x = hp * _phys(wp, c)
    per_o = _phys(ho * wo, o)
    per_image = per_p + 2 * per_x + 2 * per_o
    nb = max(1, _P_BUDGET // max(per_image, 1))
    nb = min(nb, n, 16)
    # Mosaic tiling: the output block's sublane dim (nb*ho*wo) must be a
    # multiple of 8, so round nb to the smallest multiple that makes it so.
    need = 8 // math.gcd(ho * wo, 8)
    return max(need, (nb // need) * need)


def _assemble_patches(x_ref, p_ref, *, kh, kw, c, ho, wo):
    """Fill the patch scratch with the kh·kw tap windows (VPU copies).

    A DMA-based assembly is ruled out by hardware tiling: the destination
    lane slice ``t*c:(t+1)*c`` must be 128-aligned for the DMA engines,
    and real conv channel counts (32, 64) aren't.  The VPU relayout copies
    below are the measured bottleneck of this kernel at small C — see the
    module docstring's dispatch discussion."""
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            p_ref[:, :, :, t * c:(t + 1) * c] = (
                x_ref[:, i:i + ho, j:j + wo, :])


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, p_ref, *, kh, kw, c,
                ho, wo, epilogue, has_bias):
    nb = x_ref.shape[0]
    _assemble_patches(x_ref, p_ref, kh=kh, kw=kw, c=c, ho=ho, wo=wo)
    k_tot = kh * kw * c
    p = p_ref[:].reshape(nb * ho * wo, k_tot)
    y = jax.lax.dot_general(
        p, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if has_bias:
        y = y + b_ref[:]
    if epilogue == "relu":
        y = jnp.maximum(y, 0.0)
    elif epilogue == "sigmoid":
        y = jax.nn.sigmoid(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _dw_kernel(x_ref, g_ref, o_ref, p_ref, *, kh, kw, c, ho, wo):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    nb = x_ref.shape[0]
    _assemble_patches(x_ref, p_ref, kh=kh, kw=kw, c=c, ho=ho, wo=wo)
    k_tot = kh * kw * c
    p = p_ref[:].reshape(nb * ho * wo, k_tot)
    g = g_ref[:]
    # dW[k, o] += Σ_rows p[r, k] · g[r, o]
    o_ref[:] += jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("kh", "kw", "padding", "epilogue",
                                    "has_bias"))
def _conv_fwd_nhwc(x, w_flat, b, *, kh, kw, padding, epilogue, has_bias):
    """x: [N, H, W, C] f32; w_flat: [kh·kw·C, O] (tap-major rows).
    Returns y: [N, Ho, Wo, O]."""
    n, h, wdim, c = x.shape
    ph, pw = padding
    o = w_flat.shape[1]
    ho = h + 2 * ph - kh + 1
    wo = wdim + 2 * pw - kw + 1
    k_tot = kh * kw * c

    nb = _pick_nb(n, ho, wo, k_tot, h + 2 * ph, wdim + 2 * pw, c, o)
    n_pad = -(-n // nb) * nb
    pads = ((0, n_pad - n), (ph, ph), (pw, pw), (0, 0))
    xp = jnp.pad(x, pads) if any(p != (0, 0) for p in pads) else x
    hp, wp = h + 2 * ph, wdim + 2 * pw

    in_specs = [
        pl.BlockSpec((nb, hp, wp, c), lambda g: (g, 0, 0, 0)),
        pl.BlockSpec((k_tot, o), lambda g: (0, 0)),
    ]
    args = [xp, w_flat]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, o), lambda g: (0, 0)))
        args.append(b.reshape(1, o))
        kernel = functools.partial(_fwd_kernel, kh=kh, kw=kw, c=c, ho=ho,
                                   wo=wo, epilogue=epilogue, has_bias=True)
    else:
        def kernel(x_ref, w_ref, o_ref, p_ref):
            _fwd_kernel(x_ref, w_ref, None, o_ref, p_ref, kh=kh,
                        kw=kw, c=c, ho=ho, wo=wo, epilogue=epilogue,
                        has_bias=False)

    y = pl.pallas_call(
        kernel,
        grid=(n_pad // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb * ho * wo, o), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad * ho * wo, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, ho, wo, k_tot), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * ho * wo * k_tot * o,
            bytes_accessed=4 * (n_pad * hp * wp * c + k_tot * o
                                + n_pad * ho * wo * o),
            transcendentals=0,
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(*args)
    return y.reshape(n_pad, ho, wo, o)[:n]


@functools.partial(jax.jit, static_argnames=("kh", "kw", "padding"))
def _conv_dw_nhwc(x, g, *, kh, kw, padding):
    """dW[k, o] for stride-1 conv: x [N,H,W,C], g [N,Ho,Wo,O] cotangent."""
    n, h, wdim, c = x.shape
    ph, pw = padding
    ho, wo = g.shape[1], g.shape[2]
    o = g.shape[3]
    k_tot = kh * kw * c

    nb = _pick_nb(n, ho, wo, k_tot, h + 2 * ph, wdim + 2 * pw, c, o)
    n_pad = -(-n // nb) * nb
    xp = jnp.pad(x, ((0, n_pad - n), (ph, ph), (pw, pw), (0, 0)))
    gp = (jnp.pad(g, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
          if n_pad != n else g)
    gp = gp.reshape(n_pad * ho * wo, o)
    hp, wp = h + 2 * ph, wdim + 2 * pw
    n_steps = n_pad // nb

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, kh=kh, kw=kw, c=c, ho=ho, wo=wo),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((nb, hp, wp, c), lambda g_: (g_, 0, 0, 0)),
            pl.BlockSpec((nb * ho * wo, o), lambda g_: (g_, 0)),
        ],
        out_specs=pl.BlockSpec((k_tot, o), lambda g_: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k_tot, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, ho, wo, k_tot), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * ho * wo * k_tot * o,
            bytes_accessed=4 * (n_pad * hp * wp * c + n_pad * ho * wo * o
                                + k_tot * o),
            transcendentals=0,
        ),
        interpret=_backend.pallas_interpret_mode(),
    )(xp, gp)
    return dw


def _flatten_w(w):
    """OIHW → [kh·kw·C, O] with tap-major (i, j, c) row order (matches the
    patch scratch lane layout)."""
    return w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])


def _flip_w(w):
    """Weight transform for dx: swap in/out channels + flip spatially."""
    return w.transpose(1, 0, 2, 3)[:, :, ::-1, ::-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_direct(x, w, b, padding=(0, 0), activation="none"):
    """Stride-1 NCHW conv with in-VMEM patch assembly (differentiable).

    ``x``: [N, C, H, W]; ``w``: OIHW; ``b``: [O] or None (pass explicitly).
    """
    kh, kw = w.shape[2], w.shape[3]
    xn = x.transpose(0, 2, 3, 1)  # NHWC
    y = _conv_fwd_nhwc(xn, _flatten_w(w), b, kh=kh, kw=kw, padding=padding,
                       epilogue=activation, has_bias=b is not None)
    return y.transpose(0, 3, 1, 2)  # NCHW


def _conv_direct_fwd(x, w, b, padding, activation):
    y = conv2d_direct(x, w, b, padding, activation)
    return y, (x, w, y, b is not None)


def _conv_direct_bwd(padding, activation, res, g):
    x, w, y, has_bias = res
    if activation == "relu":
        g = jnp.where(y > 0, g, 0.0)
    elif activation == "sigmoid":
        g = g * y * (1.0 - y)
    kh, kw = w.shape[2], w.shape[3]
    ph, pw = padding
    # dx: conv of the cotangent with flipped weights, complementary pad.
    dx = conv2d_direct(g, _flip_w(w), None,
                       (kh - 1 - ph, kw - 1 - pw), "none")
    # dw: per-tap patchᵀ·g accumulated across the batch grid.
    dw_flat = _conv_dw_nhwc(x.transpose(0, 2, 3, 1),
                            g.transpose(0, 2, 3, 1),
                            kh=kh, kw=kw, padding=padding)
    o = w.shape[0]
    c = w.shape[1]
    dw = dw_flat.reshape(kh, kw, c, o).transpose(3, 2, 0, 1)
    db = jnp.sum(g, axis=(0, 2, 3)) if has_bias else None
    return dx, dw, db


conv2d_direct.defvjp(_conv_direct_fwd, _conv_direct_bwd)
