"""W8A8 int8-MXU matmul (ops/pallas/quant.py: matmul_int8 /
linear_w8a8)."""

import numpy as np
import jax
import jax.numpy as jnp

from taper_tpu.ops.pallas import quant as Q
from taper_tpu.quantization.config import (QuantizationConfig,
                                            QuantizationSchema)
from taper_tpu.quantization.qtensor import quantize as qt_quantize


def test_matmul_int8_exact_integer_arithmetic():
    rng = np.random.default_rng(0)
    xq = rng.integers(-127, 128, (37, 100), dtype=np.int8)
    q = rng.integers(-127, 128, (53, 100), dtype=np.int8)
    got = np.asarray(Q.matmul_int8(jnp.asarray(xq), jnp.asarray(q)))
    ref = xq.astype(np.int64) @ q.astype(np.int64).T
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_linear_w8a8_close_to_f32_linear():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (64, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (48, 96)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (48,)).astype(np.float32))
    qt = qt_quantize(w, QuantizationConfig.int8())
    ref = x @ qt.dequantize().T + b       # weight error already priced
    got = Q.linear_w8a8(x, qt.values, qt.scale, qt.zero_point, b)
    # the remaining error is activation rounding (~0.4%/element over a
    # 96-term contraction)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 2e-2, err


def test_linear_w8a8_relu_epilogue_and_per_channel():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (32, 64)).astype(np.float32))
    w = jnp.asarray((rng.normal(0, 0.1, (16, 64))
                     * rng.uniform(0.1, 4.0, (16, 1))).astype(np.float32))
    qt = qt_quantize(w, QuantizationConfig.int8(schema=QuantizationSchema.PER_CHANNEL))
    ref = jnp.maximum(x @ qt.dequantize().T, 0.0)
    got = Q.linear_w8a8(x, qt.values, qt.scale, qt.zero_point,
                        epilogue="relu")
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 2e-2
    assert float(jnp.min(got)) >= 0.0


def test_quantize_rows_matches_xla_form():
    """The one-pass Pallas row-quant kernel must agree exactly with the
    reference XLA absmax/round/codes-sum form (same fp ops, one read)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 2, (34, 192)).astype(np.float32))
    xq, sx, xsum = Q.quantize_rows(x)
    xf = x.astype(jnp.float32)
    sx_ref = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    xq_ref = jnp.round(xf / sx_ref[:, None]).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sx_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xsum),
        np.asarray(jnp.sum(xq_ref.astype(jnp.int32), axis=-1),
                   dtype=np.float32), rtol=0)


def test_quantize_rows_bf16_input():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (16, 256))).astype(jnp.bfloat16)
    xq, sx, xsum = Q.quantize_rows(x)
    assert xq.dtype == jnp.int8 and xq.shape == x.shape
    back = np.asarray(xq, np.float32) * np.asarray(sx)[:, None]
    np.testing.assert_allclose(back, np.asarray(x, np.float32),
                               atol=float(np.max(np.asarray(sx))) / 2
                               + 1e-6)


def test_rowquant_block_selection_is_mosaic_legal():
    """r5 regression: at K=8192 the old VMEM cap picked bm=64, an
    illegal lane width for the (8, bm) scale-output blocks (Mosaic
    requires %128==0 or ==M) — the W8A8 prefill at dim 2048 crashed at
    lowering on real TPU while interpret-mode tests passed.  The
    selection must return only legal blocks, at EVERY shape."""
    from taper_tpu.ops.pallas.quant import _rowquant_block

    for m in (1, 8, 16, 34, 52, 128, 256, 4096, 8192, 16384):
        for k in (64, 192, 2048, 4096, 8192, 10000, 16384, 32768):
            for itemsize in (2, 4):
                bm = _rowquant_block(m, k, itemsize)
                if bm is None:
                    continue            # XLA fallback — always safe
                assert bm == m or (bm % 128 == 0 and m % bm == 0), \
                    (m, k, itemsize, bm)
                assert bm * k * (itemsize + 1) <= 6 * 1024 * 1024 or \
                    bm == m <= (6 * 1024 * 1024) // (k * (itemsize + 1)) or \
                    m <= (6 * 1024 * 1024) // max(k * (itemsize + 1), 1), \
                    (m, k, itemsize, bm)


def test_quantize_rows_large_k_falls_back_correctly():
    """K=8192 (the dim-2048 MLP w2 shape class, scaled down in M) must
    produce the exact XLA-form result whichever path engages."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (256, 8192)).astype(np.float32))
    xq, sx, xsum = Q.quantize_rows(x)
    sx_ref = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-8) / 127.0
    xq_ref = jnp.round(x / sx_ref[:, None]).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(xq), np.asarray(xq_ref))
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sx_ref),
                               rtol=1e-6)
