"""Reference smoke-test parity (``tests/smoke.rs``): the same analytic
gradient identities the reference checks by hand, verified against JAX
autodiff, plus the numerical-stability and end-to-end mini-training cases.
"""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import losses as L
from taper_tpu import nn, optim
from taper_tpu.ops import tensor_ops as T


def test_mul_grads():
    # smoke.rs:19-30: d(a·b)/da = b, d(a·b)/db = a
    a = jnp.array([2.0, 3.0])
    b = jnp.array([5.0, 7.0])
    ga, gb = jax.grad(lambda a_, b_: jnp.sum(a_ * b_), argnums=(0, 1))(a, b)
    np.testing.assert_allclose(ga, b)
    np.testing.assert_allclose(gb, a)


def test_compound_affine():
    # smoke.rs:32-43: y = a·x + b ; dy/da = x, dy/dx = a, dy/db = 1
    a, x, b = jnp.float32(3.0), jnp.float32(4.0), jnp.float32(5.0)
    g = jax.grad(lambda a_, x_, b_: a_ * x_ + b_, argnums=(0, 1, 2))(a, x, b)
    np.testing.assert_allclose(g, (4.0, 3.0, 1.0))


def test_matmul_shapes_and_grads():
    # smoke.rs:45-70: [[1,2,3],[4,5,6]] @ [[7,8],[9,10],[11,12]]
    a = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = jnp.array([[7.0, 8.0], [9.0, 10.0], [11.0, 12.0]])
    c = a @ b
    np.testing.assert_allclose(c, [[58.0, 64.0], [139.0, 154.0]])
    # grads of sum(C): dA = 1·Bᵀ, dB = Aᵀ·1
    ga, gb = jax.grad(lambda a_, b_: jnp.sum(a_ @ b_), argnums=(0, 1))(a, b)
    ones = jnp.ones_like(c)
    np.testing.assert_allclose(ga, ones @ b.T)
    np.testing.assert_allclose(gb, a.T @ ones)


def test_reshape_sum_grads_are_ones():
    # smoke.rs:292-307 / :338-354: reshape+sum gradient = ones
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4))
    g = jax.grad(lambda t: jnp.sum(T.reshape(t, (4, 3))))(x)
    np.testing.assert_allclose(g, jnp.ones_like(x))
    g2 = jax.grad(lambda t: jnp.sum(T.sum(t, dim=1)))(x)
    np.testing.assert_allclose(g2, jnp.ones_like(x))


def test_exp_log_grad_identities():
    # smoke.rs:408-435: d exp(x) = exp(x); d log(x) = 1/x
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (5,))) + 0.5
    np.testing.assert_allclose(
        jax.grad(lambda t: jnp.sum(T.exp(t)))(x), jnp.exp(x), rtol=1e-6)
    np.testing.assert_allclose(
        jax.grad(lambda t: jnp.sum(T.log(t)))(x), 1.0 / x, rtol=1e-6)


def test_pow_sqrt_grads():
    x = jnp.array([1.0, 4.0, 9.0])
    np.testing.assert_allclose(
        jax.grad(lambda t: jnp.sum(T.pow(t, 3)))(x), 3 * x ** 2)
    np.testing.assert_allclose(
        jax.grad(lambda t: jnp.sum(T.sqrt(t)))(x), 0.5 / jnp.sqrt(x))


def test_broadcast_helpers_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    b = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(T.add_broadcast(x, b), x + b)
    # bias grad accumulates over batch (tensor.rs:676-700)
    gb = jax.grad(lambda b_: jnp.sum(T.add_broadcast(x, b_) ** 2))(b)
    np.testing.assert_allclose(gb, jnp.sum(2 * (x + b), axis=0), rtol=1e-5)
    r = jnp.ones((4, 1))
    np.testing.assert_allclose(T.sub_broadcast_rows(x, r), x - 1.0)


def test_slice_cat_are_differentiable():
    # The reference's slice/cat helpers are untracked (nn.rs:860-1016);
    # ours must carry gradients.
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 4, 4))
    def f(t):
        a = T.slice_channels(t, 0, 3)
        b = T.slice_channels(t, 3, 6)
        return jnp.sum(T.cat([a * 2.0, b * 3.0], axis=1) ** 2)
    g = jax.grad(f)(x)
    assert float(jnp.min(jnp.abs(g))) >= 0  # defined everywhere
    np.testing.assert_allclose(g[:, :3], 8.0 * x[:, :3], rtol=1e-5)
    np.testing.assert_allclose(g[:, 3:], 18.0 * x[:, 3:], rtol=1e-5)


def test_numerical_stability_softmax_1000():
    # smoke.rs:504-523
    x = jnp.array([[1000.0, 999.0, 998.0]])
    assert bool(jnp.all(jnp.isfinite(L.softmax(x))))


def test_mnist_simulation_linear_model():
    # smoke.rs:462-502: 4-sample linear-model CE step reduces loss
    x = jnp.eye(4)
    y = jnp.arange(4)
    layer = nn.Linear(4, 4)
    params = layer.init(jax.random.PRNGKey(0))
    opt = optim.SGD(0.5)
    state = opt.init(params)
    loss0 = float(L.cross_entropy_loss(layer.apply(params, x), y))
    for _ in range(5):
        g = jax.grad(lambda p: L.cross_entropy_loss(
            layer.apply(p, x), y))(params)
        params, state = opt.update(g, state, params)
    loss1 = float(L.cross_entropy_loss(layer.apply(params, x), y))
    assert loss1 < loss0


def test_sub_div_grads():
    # reference src/ops.rs Sub (:377-416) and Div (:440-496) grad formulas
    a = jnp.array([2.0, 6.0])
    b = jnp.array([4.0, 3.0])
    ga, gb = jax.grad(lambda a_, b_: jnp.sum(T.sub(a_, b_)),
                      argnums=(0, 1))(a, b)
    np.testing.assert_allclose(ga, jnp.ones(2))
    np.testing.assert_allclose(gb, -jnp.ones(2))
    ga, gb = jax.grad(lambda a_, b_: jnp.sum(T.div(a_, b_)),
                      argnums=(0, 1))(a, b)
    np.testing.assert_allclose(ga, 1.0 / b)
    np.testing.assert_allclose(gb, -a / b ** 2)
