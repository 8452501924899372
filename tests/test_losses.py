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


# ---------------------------------------------------------------------------
# Fused linear + cross-entropy (chunked vocab head, no [N, V] logits)
# ---------------------------------------------------------------------------

def test_fused_linear_ce_matches_naive_values_and_grads():
    from taper_tpu.losses import fused_linear_cross_entropy

    rng = np.random.default_rng(0)
    n, d, v = 24, 16, 50
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    head = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(n,)).astype(np.float32))

    def naive(x, head):
        logits = x @ head.T
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        return nll

    # chunk=16 does NOT divide v=50: exercises the padded tail
    for chunk in (16, 50, 128):
        nll, pred = fused_linear_cross_entropy(x, head, tgt, chunk=chunk)
        np.testing.assert_allclose(np.asarray(nll), np.asarray(naive(x, head)),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(pred), np.asarray(jnp.argmax(x @ head.T, axis=-1)))

        # weighted-sum grads wrt BOTH x and head match autodiff-of-naive
        gx1, gh1 = jax.grad(
            lambda x, h: jnp.sum(fused_linear_cross_entropy(
                x, h, tgt, chunk=chunk)[0] * w), argnums=(0, 1))(x, head)
        gx2, gh2 = jax.grad(
            lambda x, h: jnp.sum(naive(x, h) * w), argnums=(0, 1))(x, head)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                                   rtol=1e-4, atol=1e-5)


def test_tinygpt_fused_loss_matches_apply_path():
    from taper_tpu import models
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    l1, a1 = masked_token_loss(model.apply(params, toks), tgts, mask)
    l2, a2 = model.loss(params, toks, tgts, mask, chunk=5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(a1), float(a2), rtol=1e-6)

    g1 = jax.grad(lambda p: masked_token_loss(
        model.apply(p, toks), tgts, mask)[0])(params)
    g2 = jax.grad(lambda p: model.loss(p, toks, tgts, mask, chunk=5)[0])(
        params)
    for k1, k2 in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=2e-4, atol=1e-5)


def test_tinygpt_fused_loss_trains():
    from taper_tpu import models, optim
    from taper_tpu.data.seq import sort_task_batch

    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        (l, _), g = jax.value_and_grad(
            lambda p: model.loss(p, toks, tgts, mask, chunk=8),
            has_aux=True)(params)
        params, state = opt.update(g, state, params)
        return params, state, l

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_fused_ce_bf16_grads_match_naive_oracle():
    """Regression: the backward must recompute logits in the FORWARD's
    dtype flow (bf16 matmul then f32 cast) — a full-f32 recompute makes
    p = exp(logits - lse) inconsistent with the saved lse and biases
    dx/dhead beyond rounding noise."""
    from taper_tpu.losses import fused_linear_cross_entropy
    rng = np.random.default_rng(0)
    n, d, v = 32, 64, 50
    x = jnp.asarray(rng.normal(0, 1, (n, d)), jnp.bfloat16)
    head = jnp.asarray(rng.normal(0, 0.2, (v, d)), jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, v, (n,)), jnp.int32)

    def fused(x, h):
        return jnp.mean(fused_linear_cross_entropy(x, h, tgt,
                                                   chunk=16)[0])

    def naive(x, h):
        logits = (x @ h.T).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[:, None], 1))

    gx_f, gh_f = jax.grad(fused, argnums=(0, 1))(x, head)
    gx_n, gh_n = jax.grad(naive, argnums=(0, 1))(x, head)
    np.testing.assert_allclose(np.asarray(gx_f, np.float32),
                               np.asarray(gx_n, np.float32),
                               rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh_f, np.float32),
                               np.asarray(gh_n, np.float32),
                               rtol=0.05, atol=1e-4)


def test_zloss_fused_matches_naive_values_and_grads():
    """z-loss differentiates through the fused path's saved online
    logsumexp: (CE + z·lse²) values and grads must equal the naive
    [N, V]-logits formulation."""
    from taper_tpu.losses import fused_linear_cross_entropy

    rng = np.random.default_rng(3)
    n, d, v, z = 24, 16, 50, 1e-2
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    head = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))

    def naive(x, h):
        logits = x @ h.T
        lse = jax.nn.logsumexp(logits, axis=-1)
        nll = lse - jnp.take_along_axis(logits, tgt[:, None], 1)[:, 0]
        return jnp.mean(nll) + z * jnp.mean(lse * lse)

    def fused(x, h):
        nll, _, lse = fused_linear_cross_entropy(x, h, tgt, chunk=16,
                                                 return_lse=True)
        return jnp.mean(nll) + z * jnp.mean(lse * lse)

    np.testing.assert_allclose(float(fused(x, head)),
                               float(naive(x, head)), rtol=1e-6)
    gx_f, gh_f = jax.grad(fused, argnums=(0, 1))(x, head)
    gx_n, gh_n = jax.grad(naive, argnums=(0, 1))(x, head)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_n),
                               rtol=1e-4, atol=1e-5)


def test_tinygpt_zloss_paths_agree_and_shrink_logits():
    """TinyGPT.loss(z_loss=...) is identical on the naive and fused
    paths, and a few z-regularized steps shrink mean logsumexp² vs
    plain CE training (the regularizer does its job)."""
    from taper_tpu import models, optim
    from taper_tpu.data.seq import sort_task_batch

    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    toks, tgts, mask = sort_task_batch(jax.random.PRNGKey(1), 8, 7)

    l1, _ = model.loss(params, toks, tgts, mask, chunk=0, z_loss=1e-2)
    l2, _ = model.loss(params, toks, tgts, mask, chunk=5, z_loss=1e-2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g1 = jax.grad(lambda p: model.loss(p, toks, tgts, mask, chunk=0,
                                       z_loss=1e-2)[0])(params)
    g2 = jax.grad(lambda p: model.loss(p, toks, tgts, mask, chunk=5,
                                       z_loss=1e-2)[0])(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)

    def train(z):
        p = model.init(jax.random.PRNGKey(0))
        opt = optim.Adam(3e-2)
        s = opt.init(p)

        @jax.jit
        def step(p, s, key):
            toks, tgts, mask = sort_task_batch(key, 16, 7)
            g = jax.grad(lambda p: model.loss(p, toks, tgts, mask,
                                              z_loss=z)[0])(p)
            return opt.update(g, s, p)

        key = jax.random.PRNGKey(2)
        for _ in range(60):
            key, k = jax.random.split(key)
            p, s = step(p, s, k)
        lse = jax.nn.logsumexp(model.apply(p, toks), axis=-1)
        return float(jnp.mean(lse * lse))

    assert train(1e-1) < train(0.0)
