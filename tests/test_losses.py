"""Loss tests — mirrors the reference's inline loss tests
(``src/loss.rs:292-374``) plus analytic-gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import losses as L


def test_softmax_sums_to_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    s = L.softmax(x)
    np.testing.assert_allclose(jnp.sum(s, axis=-1), np.ones(4), atol=1e-6)
    assert bool(jnp.all(s >= 0))


def test_log_softmax_consistency():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
    np.testing.assert_allclose(L.log_softmax(x), jnp.log(L.softmax(x)),
                               atol=1e-6)


def test_softmax_numerical_stability():
    # Reference feeds values ~1000 and asserts no NaN/Inf
    # (tests/smoke.rs:504-523).
    x = jnp.array([[1000.0, 999.0, 998.0], [-1000.0, 0.0, 1000.0]])
    s = L.softmax(x)
    lp = L.log_softmax(x)
    assert bool(jnp.all(jnp.isfinite(s)))
    assert bool(jnp.all(jnp.isfinite(lp)))
    ce = L.cross_entropy_loss(x, jnp.array([0, 2]))
    assert bool(jnp.isfinite(ce))


def test_cross_entropy_grad_is_softmax_minus_onehot_over_b():
    """The reference hand-codes CE backward as (softmax − onehot)·g/B
    (``src/loss.rs:174-191``); autodiff must produce exactly that."""
    logits = jax.random.normal(jax.random.PRNGKey(0), (6, 5))
    targets = jnp.array([0, 1, 2, 3, 4, 0])
    g = jax.grad(L.cross_entropy_loss)(logits, targets)
    expected = (L.softmax(logits) - L.one_hot(targets, 5)) / 6
    np.testing.assert_allclose(g, expected, atol=1e-6)


def test_cross_entropy_accepts_b1_targets():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    t_flat = jnp.array([0, 1, 2, 0])
    t_col = t_flat[:, None]
    np.testing.assert_allclose(L.cross_entropy_loss(logits, t_flat),
                               L.cross_entropy_loss(logits, t_col))


def test_cross_entropy_onehot_matches_index_version():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    targets = jnp.array([0, 1, 2, 0])
    np.testing.assert_allclose(
        L.cross_entropy_loss(logits, targets),
        L.cross_entropy_loss_onehot(logits, L.one_hot(targets, 3)),
        atol=1e-6)


def test_one_hot():
    oh = L.one_hot(jnp.array([1, 0, 2]), 3)
    np.testing.assert_allclose(
        oh, [[0, 1, 0], [1, 0, 0], [0, 0, 1]])


def test_accuracy():
    logits = jnp.array([[2.0, 1.0], [0.0, 3.0], [5.0, 1.0], [0.0, 1.0]])
    targets = jnp.array([0, 1, 1, 1])
    assert float(L.accuracy(logits, targets)) == 0.75


def test_bce_loss_clamps_and_grads():
    # eps clamp 1e-7 keeps log finite even at 0/1 preds (loss.rs:23).
    preds = jnp.array([0.0, 1.0, 0.5])
    targets = jnp.array([0.0, 1.0, 1.0])
    loss = L.bce_loss(preds, targets)
    assert bool(jnp.isfinite(loss))
    g = jax.grad(L.bce_loss)(jnp.array([0.3, 0.7]), jnp.array([1.0, 0.0]))
    assert bool(jnp.all(jnp.isfinite(g)))
    # dBCE/dp = (p−t)/(p(1−p))/N
    expected = (jnp.array([0.3, 0.7]) - jnp.array([1.0, 0.0])) / (
        jnp.array([0.3, 0.7]) * (1 - jnp.array([0.3, 0.7]))) / 2
    np.testing.assert_allclose(g, expected, atol=1e-5)


def test_mse_loss():
    p = jnp.array([1.0, 2.0, 3.0])
    t = jnp.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(L.mse_loss(p, t), 5.0 / 3.0, atol=1e-6)
    g = jax.grad(L.mse_loss)(p, t)
    np.testing.assert_allclose(g, 2 * (p - t) / 3, atol=1e-6)


def test_cross_entropy_smoothed():
    import numpy as np
    from taper_tpu import losses
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 5))
    y = jnp.arange(8) % 5
    # smoothing=0 reduces to plain CE
    np.testing.assert_allclose(
        float(losses.cross_entropy_loss_smoothed(logits, y, 0.0)),
        float(losses.cross_entropy_loss(logits, y)), rtol=1e-6)
    # smoothed loss is bounded below by the smoothed entropy floor and
    # differs from plain CE
    l_s = float(losses.cross_entropy_loss_smoothed(logits, y, 0.1))
    l_p = float(losses.cross_entropy_loss(logits, y))
    assert l_s != l_p
    # hand formula check on one sample
    lp = jax.nn.log_softmax(logits[0])
    want = -0.9 * lp[int(y[0])] - 0.1 * jnp.mean(lp)
    one = losses.cross_entropy_loss_smoothed(logits[:1], y[:1], 0.1)
    np.testing.assert_allclose(float(one), float(want), rtol=1e-6)
