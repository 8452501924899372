"""Op-level tests: Pallas-vs-XLA parity and finite-difference gradients.

Exceeds the reference's hand-checked-scalar style (``tests/smoke.rs:19-70``)
with systematic finite differences and full backend cross-checks
(SURVEY.md §4 "Implication for the rebuild").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taper_tpu import ops
from taper_tpu.ops import use_backend

TOL = 1e-4


def _fd_grad(f, x, eps=1e-3):
    """Central finite differences on a flat array function."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32))
                - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_matmul_forward_and_grad(backend):
    a = jax.random.normal(jax.random.PRNGKey(0), (5, 7))
    b = jax.random.normal(jax.random.PRNGKey(1), (7, 4))
    with use_backend(backend):
        out = ops.matmul(a, b)
    np.testing.assert_allclose(out, a @ b, atol=TOL)

    def f(a_):
        with use_backend(backend):
            return float(jnp.sum(ops.matmul(a_, b) ** 2))

    with use_backend(backend):
        g = jax.grad(lambda a_: jnp.sum(ops.matmul(a_, b) ** 2))(a)
    np.testing.assert_allclose(g, _fd_grad(f, a), rtol=5e-3, atol=2e-2)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("activation", [None, "relu", "sigmoid"])
def test_linear_parity(backend, activation):
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 11))
    w = jax.random.normal(jax.random.PRNGKey(1), (9, 11))
    b = jax.random.normal(jax.random.PRNGKey(2), (9,))
    ref = x @ w.T + b
    if activation == "relu":
        ref = jnp.maximum(ref, 0)
    elif activation == "sigmoid":
        ref = jax.nn.sigmoid(ref)
    with use_backend(backend):
        out = ops.linear(x, w, b, activation=activation)
    np.testing.assert_allclose(out, ref, atol=TOL)


def test_linear_grads_match_across_backends():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 11))
    w = jax.random.normal(jax.random.PRNGKey(1), (9, 11))
    b = jax.random.normal(jax.random.PRNGKey(2), (9,))

    def loss(backend):
        def f(x_, w_, b_):
            with use_backend(backend):
                return jnp.sum(ops.linear(x_, w_, b_, activation="relu") ** 2)
        return f

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, b)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gx, gp):
        np.testing.assert_allclose(a, c, atol=TOL)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_elementwise(backend):
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 17))
    y = jax.random.normal(jax.random.PRNGKey(1), (3, 17))
    with use_backend(backend):
        np.testing.assert_allclose(ops.relu(x), jnp.maximum(x, 0), atol=TOL)
        np.testing.assert_allclose(ops.sigmoid(x), jax.nn.sigmoid(x),
                                   atol=TOL)
        np.testing.assert_allclose(ops.add(x, y), x + y, atol=TOL)
        np.testing.assert_allclose(ops.mul(x, y), x * y, atol=TOL)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_elementwise_broadcasting(backend):
    # The pallas backend must match xla broadcasting semantics
    # (ADVICE round 1: add((4,1),(4,5)) silently returned (4,1)).
    a = jax.random.normal(jax.random.PRNGKey(0), (4, 1))
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 5))
    row = jax.random.normal(jax.random.PRNGKey(2), (5,))
    with use_backend(backend):
        np.testing.assert_allclose(ops.add(a, b), a + b, atol=TOL)
        np.testing.assert_allclose(ops.mul(a, b), a * b, atol=TOL)
        np.testing.assert_allclose(ops.add(b, row), b + row, atol=TOL)
        # Gradients reduce over the broadcast dimensions.
        ga = jax.grad(lambda t: jnp.sum(ops.add(t, b) * b))(a)
    np.testing.assert_allclose(ga, jnp.sum(b, axis=1, keepdims=True),
                               atol=TOL)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_sub_div(backend):
    """Sub/Div kernel-backend parity with the reference's grad formulas
    (src/ops.rs:377-496): sub -> (+g, -g); div -> (g/b, -g*a/b^2)."""
    a = jax.random.normal(jax.random.PRNGKey(0), (3, 17))
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 17)) + 2.0
    row = jax.random.normal(jax.random.PRNGKey(2), (17,)) + 2.0
    with use_backend(backend):
        np.testing.assert_allclose(ops.sub(a, b), a - b, atol=TOL)
        np.testing.assert_allclose(ops.div(a, b), a / b, atol=TOL)
        np.testing.assert_allclose(ops.sub(a, row), a - row, atol=TOL)
        ga, gb = jax.grad(lambda x, y: jnp.sum(ops.sub(x, y) * b),
                          argnums=(0, 1))(a, b)
        np.testing.assert_allclose(ga, b, atol=TOL)
        np.testing.assert_allclose(gb, -b, atol=TOL)
        da, db = jax.grad(lambda x, y: jnp.sum(ops.div(x, y)),
                          argnums=(0, 1))(a, b)
    np.testing.assert_allclose(da, 1.0 / b, atol=TOL)
    np.testing.assert_allclose(db, -a / (b * b), atol=1e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_elementwise_bf16(backend):
    """bf16 inputs through the full elementwise family keep their dtype
    and match the f32 oracle within bf16 resolution."""
    xf = jax.random.normal(jax.random.PRNGKey(0), (5, 33))
    yf = jax.random.normal(jax.random.PRNGKey(1), (5, 33)) + 2.0
    x, y = xf.astype(jnp.bfloat16), yf.astype(jnp.bfloat16)
    with use_backend(backend):
        for op, ref in ((ops.add, xf + yf), (ops.mul, xf * yf),
                        (ops.sub, xf - yf), (ops.div, xf / yf),
                        (ops.relu, jnp.maximum(xf, 0))):
            got = op(x, y) if op is not ops.relu else op(x)
            assert got.dtype == jnp.bfloat16, op
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref),
                atol=0.11, rtol=0.02)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_fma(backend):
    # Reference fma_f32_simd (src/tensor.rs:203-233): out = a*b + c.
    a = jax.random.normal(jax.random.PRNGKey(0), (3, 17))
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 17))
    c = jax.random.normal(jax.random.PRNGKey(2), (3, 17))
    with use_backend(backend):
        np.testing.assert_allclose(ops.fma(a, b, c), a * b + c, atol=TOL)
        g = jax.grad(
            lambda t: jnp.sum(ops.fma(t, b, c)), argnums=0)(a)
    np.testing.assert_allclose(g, b, atol=TOL)


def test_relu_grad_masks_negative():
    # Reference semantics: grad passes only where input > 0
    # (src/ops.rs:358-370).
    x = jnp.array([[-1.0, 0.5, 2.0, -0.2]])
    for backend in ("xla", "pallas"):
        with use_backend(backend):
            g = jax.grad(lambda t: jnp.sum(ops.relu(t)))(x)
        np.testing.assert_allclose(g, [[0.0, 1.0, 1.0, 0.0]], atol=TOL)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("cfg", [
    dict(cin=3, cout=4, k=3, stride=1, padding=1),
    dict(cin=2, cout=5, k=1, stride=1, padding=0),
    dict(cin=3, cout=4, k=3, stride=2, padding=0),
])
def test_conv2d_parity(backend, cfg):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, cfg["cin"], 8, 8))
    w = jax.random.normal(
        jax.random.PRNGKey(1), (cfg["cout"], cfg["cin"], cfg["k"], cfg["k"]))
    b = jax.random.normal(jax.random.PRNGKey(2), (cfg["cout"],))
    ref = ops.conv2d(x, w, b, stride=cfg["stride"], padding=cfg["padding"])
    with use_backend(backend):
        out = ops.conv2d(x, w, b, stride=cfg["stride"],
                         padding=cfg["padding"])
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_conv2d_grads_match_across_backends():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 6, 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3, 3))
    b = jax.random.normal(jax.random.PRNGKey(2), (4,))

    def loss(backend):
        def f(x_, w_, b_):
            with use_backend(backend):
                return jnp.sum(ops.conv2d_relu(x_, w_, b_, padding=1) ** 2)
        return f

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(x, w, b)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gx, gp):
        np.testing.assert_allclose(a, c, atol=1e-3)


def test_conv_weight_grad_finite_difference():
    """The reference's conv weight grads are severed (SURVEY.md §2.2 ⚠);
    ours must match finite differences."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 5, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 3, 3)) * 0.5

    def f(w_):
        return float(jnp.sum(ops.conv2d(x, w_, None, padding=1) ** 2))

    g = jax.grad(lambda w_: jnp.sum(ops.conv2d(x, w_, None, padding=1) ** 2))(w)
    np.testing.assert_allclose(g, _fd_grad(f, w), atol=5e-2, rtol=1e-2)


def test_grouped_conv_is_differentiable():
    # The reference's grouped path is non-differentiable (src/nn.rs:278-334
    # slices/cat are untracked); ours must produce nonzero weight grads.
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 6))
    w = jax.random.normal(jax.random.PRNGKey(1), (6, 2, 3, 3))
    for backend in ("xla", "pallas"):
        with use_backend(backend):
            g = jax.grad(lambda w_: jnp.sum(
                ops.conv2d(x, w_, None, padding=1, groups=2) ** 2))(w)
        assert float(jnp.sum(jnp.abs(g))) > 0


def test_conv2d_direct_matches_xla_and_grads():
    # The implicit-im2col kernel (patches built in VMEM, VERDICT round-1
    # item 3): forward + all three grads vs the XLA conv.
    from taper_tpu.ops.pallas.conv_direct import conv2d_direct
    from taper_tpu.ops import xla as X

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 9, 10))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 3, 3)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(2), (7,))

    y = conv2d_direct(x, w, b, (1, 1), "relu")
    ref = X.conv2d(x, w, b, stride=(1, 1), padding=(1, 1),
                   activation=X.relu)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=1e-3)

    def loss_d(x_, w_, b_):
        return jnp.sum(conv2d_direct(x_, w_, b_, (1, 1), "relu") ** 2)

    def loss_x(x_, w_, b_):
        return jnp.sum(X.conv2d(x_, w_, b_, stride=(1, 1), padding=(1, 1),
                                activation=X.relu) ** 2)

    gd = jax.grad(loss_d, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gd, gx):
        np.testing.assert_allclose(a, c, atol=5e-3, rtol=5e-3)


def test_conv2d_direct_valid_padding_no_bias():
    from taper_tpu.ops.pallas.conv_direct import conv2d_direct
    from taper_tpu.ops import xla as X

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 5, 5)) * 0.2
    y = conv2d_direct(x, w, None, (0, 0), "none")
    ref = X.conv2d(x, w, None, stride=(1, 1), padding=(0, 0))
    assert y.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=1e-3)
    gx = jax.grad(lambda x_: jnp.sum(
        conv2d_direct(x_, w, None, (0, 0), "none") ** 2))(x)
    gr = jax.grad(lambda x_: jnp.sum(
        X.conv2d(x_, w, None, stride=(1, 1), padding=(0, 0)) ** 2))(x)
    np.testing.assert_allclose(gx, gr, atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("mode", ["max", "avg"])
def test_pool_parity(backend, mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 17, 17))
    fn = ops.max_pool2d if mode == "max" else ops.avg_pool2d
    ref = fn(x, kernel=2)  # default xla backend
    with use_backend(backend):
        out = fn(x, kernel=2)
    assert out.shape == (2, 3, 8, 8)
    np.testing.assert_allclose(out, ref, atol=TOL)


def test_pool_pallas_kernel_formulation():
    # The shift-select kernel is a formulation study (all pools dispatch
    # to XLA by default; TAPER_POOL=pallas opts in) — keep it correct.
    from taper_tpu.ops.pallas import pool as P
    from taper_tpu.ops import xla as X

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8, 16))
    np.testing.assert_allclose(P._max_pool_p(x, 2, 2),
                               X.max_pool2d(x, kernel=2), atol=TOL)
    np.testing.assert_allclose(P._avg_pool_p(x, 2, 2),
                               X.avg_pool2d(x, kernel=2), atol=TOL)
    gp = jax.grad(lambda t: jnp.sum(P._max_pool_p(t, 2, 2) ** 2))(x)
    gx = jax.grad(lambda t: jnp.sum(X.max_pool2d(t, kernel=2) ** 2))(x)
    np.testing.assert_allclose(gp, gx, atol=TOL)


def test_pool_grads_match_across_backends():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 16, 16))

    def loss(backend):
        def f(t):
            with use_backend(backend):
                return (jnp.sum(ops.max_pool2d(t, kernel=2) ** 2)
                        + jnp.sum(ops.avg_pool2d(t, kernel=2) ** 2))
        return f

    gx = jax.grad(loss("xla"))(x)
    gp = jax.grad(loss("pallas"))(x)
    np.testing.assert_allclose(gx, gp, atol=TOL)


def test_conv2d_large_k_pallas_path():
    """C*kh*kw >= 1024 engages the Pallas im2col+GEMM route (small-K convs
    delegate to XLA — see conv.py dispatch policy)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 6, 6)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 128, 3, 3)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (32,))
    ref = ops.conv2d(x, w, b, padding=1, activation="relu")
    with use_backend("pallas"):
        out = ops.conv2d(x, w, b, padding=1, activation="relu")
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)

    def loss(backend):
        def f(w_):
            with use_backend(backend):
                return jnp.sum(ops.conv2d(x, w_, b, padding=1,
                                          activation="relu") ** 2)
        return f

    gx = jax.grad(loss("xla"))(w)
    gp = jax.grad(loss("pallas"))(w)
    np.testing.assert_allclose(gx, gp, atol=1e-2, rtol=1e-2)
