"""Layer/module tests (reference ``src/nn.rs`` behaviors, functional style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taper_tpu import nn


def test_linear_shapes_and_init_scale():
    layer = nn.Linear(64, 32)
    p = layer.init(jax.random.PRNGKey(0))
    assert p["w"].shape == (32, 64)
    assert p["b"].shape == (32,)
    bound = np.sqrt(2.0 / 64)
    assert float(jnp.max(jnp.abs(p["w"]))) <= bound
    y = layer.apply(p, jnp.ones((4, 64)))
    assert y.shape == (4, 32)


def test_sequential_mlp_forward():
    model = nn.Sequential(
        nn.Linear(8, 16), nn.ReLU(), nn.Linear(16, 4))
    p = model.init(jax.random.PRNGKey(0))
    y = model.apply(p, jnp.ones((2, 8)))
    assert y.shape == (2, 4)
    assert model.param_count(p) == 8 * 16 + 16 + 16 * 4 + 4


def test_fused_activation_matches_separate():
    fused = nn.Sequential(nn.Linear(8, 6, activation="relu"))
    split = nn.Sequential(nn.Linear(8, 6), nn.ReLU())
    p = fused.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    np.testing.assert_allclose(fused.apply(p, x), split.apply(p + [{}], x),
                               atol=1e-6)


def test_conv2d_shapes():
    conv = nn.Conv2d(3, 8, 3, padding=1)
    p = conv.init(jax.random.PRNGKey(0))
    assert p["w"].shape == (8, 3, 3, 3)
    y = conv.apply(p, jnp.ones((2, 3, 10, 10)))
    assert y.shape == (2, 8, 10, 10)


def test_conv2d_relu_nonneg():
    conv = nn.Conv2dReLU(1, 4, 3, padding=1)
    p = conv.init(jax.random.PRNGKey(0))
    y = conv.apply(p, jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 8)))
    assert float(jnp.min(y)) >= 0.0


def test_grouped_conv_shapes():
    conv = nn.Conv2d(4, 6, 3, padding=1, groups=2)
    p = conv.init(jax.random.PRNGKey(0))
    assert p["w"].shape == (6, 2, 3, 3)
    y = conv.apply(p, jnp.ones((1, 4, 6, 6)))
    assert y.shape == (1, 6, 6, 6)


def test_pools_and_flatten():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    assert nn.MaxPool2d.new_2x2().apply({}, x).shape == (2, 3, 4, 4)
    assert nn.AvgPool2d(2).apply({}, x).shape == (2, 3, 4, 4)
    assert nn.AvgPool2d.global_().apply({}, x).shape == (2, 3, 1, 1)
    assert nn.AdaptiveAvgPool2d((2, 2)).apply({}, x).shape == (2, 3, 2, 2)
    assert nn.AdaptiveAvgPool2d.global_().apply({}, x).shape == (2, 3, 1, 1)
    assert nn.Flatten().apply({}, x).shape == (2, 192)
    assert nn.Flatten(start_dim=2).apply({}, x).shape == (2, 3, 64)


def test_adaptive_avg_pool_matches_reference_rule():
    # kernel = stride = floor(in/out) (src/nn.rs:669-686).
    x = jnp.arange(2 * 1 * 6 * 6, dtype=jnp.float32).reshape(2, 1, 6, 6)
    out = nn.AdaptiveAvgPool2d((3, 3)).apply({}, x)
    assert out.shape == (2, 1, 3, 3)
    np.testing.assert_allclose(
        out[0, 0, 0, 0], jnp.mean(x[0, 0, :2, :2]), atol=1e-6)


def test_dropout_train_eval():
    drop = nn.Dropout(0.5)
    x = jnp.ones((100, 100))
    y_eval = drop.apply({}, x, train=False)
    np.testing.assert_allclose(y_eval, x)
    y_train = drop.apply({}, x, train=True, rng=jax.random.PRNGKey(0))
    kept = float(jnp.mean(y_train > 0))
    assert 0.4 < kept < 0.6
    # inverted scaling: surviving values are 1/keep
    assert np.isclose(float(jnp.max(y_train)), 2.0)
    with pytest.raises(ValueError):
        drop.apply({}, x, train=True)


def test_dropout_inside_sequential_gets_rng():
    model = nn.Sequential(nn.Linear(8, 8), nn.Dropout(0.5), nn.Linear(8, 2))
    p = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((4, 8))
    y1 = model.apply(p, x, train=True, rng=jax.random.PRNGKey(1))
    y2 = model.apply(p, x, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(y1, y2)
    y3 = model.apply(p, x, train=False)
    y4 = model.apply(p, x, train=False)
    np.testing.assert_allclose(y3, y4)


def test_batchnorm_normalizes():
    bn = nn.BatchNorm2d(3)
    p = bn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 4, 4)) * 5 + 2
    y = bn.apply(p, x, train=True)
    np.testing.assert_allclose(jnp.mean(y, axis=(0, 2, 3)), np.zeros(3),
                               atol=1e-4)
    np.testing.assert_allclose(jnp.std(y, axis=(0, 2, 3)), np.ones(3),
                               atol=1e-2)
    p2 = bn.updated_stats(p, x)
    assert not np.allclose(p2["running_mean"], p["running_mean"])


def test_batchnorm_apply_train_updates_stats():
    bn = nn.BatchNorm2d(3)
    p = bn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 4, 4)) * 5 + 2
    y, p2 = bn.apply_train(p, x)
    # normalizes with batch stats
    np.testing.assert_allclose(jnp.mean(y, axis=(0, 2, 3)), np.zeros(3),
                               atol=1e-4)
    # and returns EMA-updated running stats matching updated_stats
    ref = bn.updated_stats(p, x)
    np.testing.assert_allclose(p2["running_mean"], ref["running_mean"],
                               atol=1e-6)
    np.testing.assert_allclose(p2["running_var"], ref["running_var"],
                               atol=1e-6)
    # stat update carries no gradient back to the input
    g = jax.grad(lambda t: jnp.sum(bn.apply_train(p, t)[1]["running_mean"])
                 * 0.0 + jnp.sum(bn.apply_train(p, t)[0]))(x)
    assert np.all(np.isfinite(g))


def test_basic_block_residual():
    blk = nn.BasicBlock(4, 8, stride=2, residual=True)
    p = blk.init(jax.random.PRNGKey(0))
    y = blk.apply(p, jnp.ones((2, 4, 8, 8)))
    assert y.shape == (2, 8, 4, 4)
    # non-residual form matches reference BasicBlock (conv3x3 + relu)
    blk2 = nn.BasicBlock(4, 8)
    p2 = blk2.init(jax.random.PRNGKey(0))
    y2 = blk2.apply(p2, jnp.ones((2, 4, 8, 8)))
    assert y2.shape == (2, 8, 8, 8)


def test_basic_block_batchnorm():
    blk = nn.BasicBlock(4, 8, stride=2, residual=True, batchnorm=True)
    p = blk.init(jax.random.PRNGKey(0))
    assert "bn1" in p and "bn2" in p
    assert "b" not in p["conv1"]  # BN replaces conv bias
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 8))
    y, p_new = blk.apply_train(p, x)
    assert y.shape == (4, 8, 4, 4)
    assert not np.allclose(p_new["bn1"]["running_mean"],
                           p["bn1"]["running_mean"])
    # weights unchanged by apply_train (only running stats move)
    np.testing.assert_allclose(p_new["conv1"]["w"], p["conv1"]["w"])
    # eval mode consumes the running stats
    y_eval = blk.apply(p_new, x, train=False)
    assert y_eval.shape == (4, 8, 4, 4)
