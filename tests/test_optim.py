"""Optimizer + scheduler tests (reference ``src/optim.rs:354-423`` and
beyond: fused-Pallas vs XLA update parity, momentum, decoupled decay)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taper_tpu import optim
from taper_tpu.ops import use_backend


def _toy():
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.full((4, 3), 0.5), "b": jnp.full((3,), -1.0)}
    return params, grads


def test_sgd_vanilla_step():
    params, grads = _toy()
    opt = optim.SGD(lr=0.1)
    state = opt.init(params)
    new, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(new["w"], 1.0 - 0.1 * 0.5, atol=1e-6)
    np.testing.assert_allclose(new["b"], 0.1, atol=1e-6)


def test_sgd_momentum_accumulates():
    params, grads = _toy()
    opt = optim.SGD(lr=0.1, momentum=0.9)
    state = opt.init(params)
    p1, state = opt.update(grads, state, params)
    p2, state = opt.update(grads, state, p1)
    # second step is larger: m = g, then m = 0.9 g + g = 1.9 g
    step1 = float(params["w"][0, 0] - p1["w"][0, 0])
    step2 = float(p1["w"][0, 0] - p2["w"][0, 0])
    np.testing.assert_allclose(step2 / step1, 1.9, atol=1e-4)


def test_adam_step_changes_params_and_respects_lr():
    params, grads = _toy()
    opt = optim.Adam(lr=1e-3)
    state = opt.init(params)
    new, state2 = opt.update(grads, state, params)
    assert not np.allclose(new["w"], params["w"])
    assert int(state2["step"]) == 1
    # First Adam step magnitude ≈ lr (bias-corrected)
    np.testing.assert_allclose(np.abs(new["w"] - params["w"]),
                               1e-3, rtol=0.05)


def test_adam_matches_manual_formula():
    p = jnp.array([1.0, -2.0])
    g = jnp.array([0.3, -0.7])
    opt = optim.Adam(lr=0.01, betas=(0.9, 0.999), eps=1e-8)
    state = opt.init(p)
    new, _ = opt.update(g, state, p)
    m = 0.1 * g
    v = 0.001 * g * g
    step = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
    ref = p - step * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(new, ref, atol=1e-6)


def test_adamw_decoupled_vs_adam_l2():
    params, grads = _toy()
    adam = optim.Adam(lr=0.01, weight_decay=0.1)
    adamw = optim.AdamW(lr=0.01, weight_decay=0.1)
    pa, _ = adam.update(grads, adam.init(params), params)
    pw, _ = adamw.update(grads, adamw.init(params), params)
    assert not np.allclose(pa["w"], pw["w"])
    # AdamW scales weights by (1 − lr·wd) before the update
    # (reference src/optim.rs:147-156).


def test_running_stats_are_not_updated():
    params = {"scale": jnp.ones(3), "running_mean": jnp.zeros(3)}
    grads = {"scale": jnp.ones(3), "running_mean": jnp.ones(3)}
    opt = optim.Adam(lr=0.1, weight_decay=0.5)
    new, _ = opt.update(grads, opt.init(params), params)
    assert not np.allclose(new["scale"], params["scale"])
    np.testing.assert_allclose(new["running_mean"], params["running_mean"])


@pytest.mark.parametrize("opt_cls,kwargs", [
    (optim.SGD, dict(lr=0.05, momentum=0.9, weight_decay=0.01)),
    (optim.Adam, dict(lr=0.01, weight_decay=0.01)),
    (optim.AdamW, dict(lr=0.01, weight_decay=0.01)),
])
def test_fused_pallas_update_matches_xla(opt_cls, kwargs):
    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (5, 7)),
              "b": jax.random.normal(jax.random.PRNGKey(1), (7,))}
    grads = {"w": jax.random.normal(jax.random.PRNGKey(2), (5, 7)),
             "b": jax.random.normal(jax.random.PRNGKey(3), (7,))}
    opt = opt_cls(**kwargs)
    with use_backend("xla"):
        px, sx = opt.update(grads, opt.init(params), params)
        px2, _ = opt.update(grads, sx, px)
    opt.FORCE_FUSED = True  # force the flat Pallas kernel (opt-in path)
    with use_backend("pallas"):
        pp, sp = opt.update(grads, opt.init(params), params)
        assert "m_flat" in sp  # fused representation engaged
        pp2, _ = opt.update(grads, sp, pp)
    for k in params:
        np.testing.assert_allclose(px[k], pp[k], atol=1e-5)
        np.testing.assert_allclose(px2[k], pp2[k], atol=1e-5)


def test_set_lr_changes_step_size_without_recompile():
    params, grads = _toy()
    opt = optim.SGD(lr=0.1)
    state = opt.init(params)
    state = opt.set_lr(state, 0.2)
    assert abs(opt.get_lr(state) - 0.2) < 1e-7
    new, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(new["b"], 0.2, atol=1e-6)


# -- schedulers (reference src/optim.rs:190-352) ----------------------------

def test_step_lr():
    s = optim.StepLR(1.0, step_size=2, gamma=0.5)
    lrs = [s.step() for _ in range(5)]
    np.testing.assert_allclose(lrs, [1.0, 0.5, 0.5, 0.25, 0.25])


def test_exponential_lr():
    s = optim.ExponentialLR(1.0, gamma=0.9)
    lrs = [s.step() for _ in range(3)]
    np.testing.assert_allclose(lrs, [0.9, 0.81, 0.729], atol=1e-9)


def test_cosine_annealing_lr():
    s = optim.CosineAnnealingLR(1.0, t_max=10, min_lr=0.1)
    lrs = [s.step() for _ in range(10)]
    assert lrs[-1] == pytest.approx(0.1, abs=1e-6)
    assert all(lrs[i] >= lrs[i + 1] for i in range(9))


def test_reduce_lr_on_plateau():
    s = optim.ReduceLROnPlateau(1.0, mode="min", factor=0.5, patience=1)
    assert s.step(1.0) == 1.0   # first metric = best
    assert s.step(1.0) == 1.0   # bad epoch 1 (<= patience)
    assert s.step(1.0) == 0.5   # bad epoch 2 → cut
    assert s.step(0.4) == 0.5   # improvement resets
    s2 = optim.ReduceLROnPlateau(1.0, mode="max", factor=0.5, patience=0)
    assert s2.step(0.9) == 1.0
    assert s2.step(0.8) == 0.5  # lower is worse in max mode


def test_warmup_cosine_schedule():
    from taper_tpu.optim import WarmupCosineLR
    sch = WarmupCosineLR(1.0, t_max=100, warmup=10, min_lr=0.1)
    lrs = [sch.step(None) for _ in range(100)]
    # linear warmup
    assert abs(lrs[0] - 0.1) < 1e-6          # (0+1)/10 * 1.0
    assert abs(lrs[9] - 1.0) < 1e-6
    # peak then monotone cosine decay to min_lr
    assert all(a >= b - 1e-9 for a, b in zip(lrs[9:], lrs[10:]))
    assert abs(lrs[-1] - 0.1) < 1e-2
    # precomputed array matches the step-by-step schedule
    arr = sch.schedule_array()
    import numpy as np
    np.testing.assert_allclose(np.asarray(arr), lrs, rtol=1e-6)


def test_clip_grad_norm():
    from taper_tpu.optim import clip_grad_norm
    import numpy as np
    g = {"a": jnp.full((3,), 3.0), "b": jnp.full((4,), 4.0)}
    # global norm = sqrt(9*3 + 16*4) = sqrt(91)
    clipped, norm = clip_grad_norm(g, 1.0)
    assert abs(float(norm) - np.sqrt(91)) < 1e-5
    cn = np.sqrt(sum(np.sum(np.square(np.asarray(l)))
                     for l in jax.tree_util.tree_leaves(clipped)))
    assert abs(cn - 1.0) < 1e-5
    # under the cap: unchanged
    same, _ = clip_grad_norm(g, 100.0)
    for a, b in zip(jax.tree_util.tree_leaves(same),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # dtype preserved for bf16 grads
    gb = {"a": jnp.ones((4,), jnp.bfloat16) * 8}
    cb, _ = clip_grad_norm(gb, 1.0)
    assert cb["a"].dtype == jnp.bfloat16


def test_accumulate_gradients_matches_full_batch():
    from taper_tpu.optim import accumulate_gradients
    import numpy as np
    w = {"w": jnp.asarray([[1.0, 2.0], [3.0, 4.0]])}
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 2))

    def loss_fn(p, batch):
        bx, by = batch
        return jnp.mean((bx @ p["w"] - by) ** 2)

    full_loss, full_g = jax.value_and_grad(loss_fn)(w, (x, y))
    mb = (x.reshape(4, 2, 2), y.reshape(4, 2, 2))
    acc_loss, acc_g = accumulate_gradients(loss_fn, w, mb)
    np.testing.assert_allclose(float(acc_loss), float(full_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_g["w"]),
                               np.asarray(full_g["w"]), rtol=1e-5)


def test_ema():
    from taper_tpu.optim import EMA
    import numpy as np
    ema = EMA(0.9)
    p = {"w": jnp.zeros((3,))}
    s = ema.init(p)
    s = ema.update(s, {"w": jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(s["w"]), 0.1, rtol=1e-6)
    s = ema.update(s, {"w": jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(s["w"]), 0.19, rtol=1e-6)


def test_ema_bf16_params_move():
    from taper_tpu.optim import EMA
    import numpy as np
    ema = EMA(0.999)
    p = {"w": jnp.ones((4,), jnp.bfloat16)}
    s = ema.init(p)
    assert s["w"].dtype == jnp.float32
    for _ in range(10):
        s = ema.update(s, {"w": jnp.full((4,), 2.0, jnp.bfloat16)})
    # f32 shadow moved (a bf16 shadow would be frozen: 1e-3 < bf16 eps)
    assert float(s["w"][0]) > 1.005
    back = EMA.as_params(s, p)
    assert back["w"].dtype == jnp.bfloat16


# -- Adafactor (beyond-reference: factored second moments) -------------------

def test_adafactor_state_is_factored():
    params = {"w": jnp.ones((64, 32)), "c": jnp.ones((4, 8, 16)),
              "b": jnp.zeros((32,))}
    opt = optim.Adafactor()
    state = opt.init(params)
    vr, vc = state["v"]["w"]
    assert vr.shape == (64,) and vc.shape == (32,)     # O(r+c), not O(rc)
    vr3, vc3 = state["v"]["c"]
    assert vr3.shape == (4, 8) and vc3.shape == (4, 16)
    assert state["v"]["b"][0].shape == (32,)           # full v for vectors
    assert "m" not in state                            # no first moment


def test_adafactor_minimizes_regression():
    # least squares: Adafactor should drive the loss down fast
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (128, 16))
    w_true = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    Y = X @ w_true
    # nonzero init: the relative step size is RMS(p)-scaled, so zero
    # params start at the eps2 floor (the paper's known cold start)
    params = {"w": 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                           (16, 4)),
              "b": jnp.zeros((4,))}
    opt = optim.Adafactor(lr=0.05)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((X @ p["w"] + p["b"] - Y) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        p, s = opt.update(g, s, p)
        return p, s, l

    losses = []
    for _ in range(200):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.01, (losses[0], losses[-1])


def test_adafactor_momentum_and_frozen_leaves():
    params = {"w": jnp.ones((8, 4)), "running_mean": jnp.ones((4,))}
    grads = {"w": jnp.full((8, 4), 0.3), "running_mean": jnp.ones((4,))}
    opt = optim.Adafactor(lr=0.1, beta1=0.9, relative_step=False)
    state = opt.init(params)
    assert "m" in state
    new, state = opt.update(grads, state, params)
    # frozen running stats never move
    np.testing.assert_array_equal(np.asarray(new["running_mean"]),
                                  np.asarray(params["running_mean"]))
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
    # clipped relative update magnitude bounded by lr * d
    assert float(jnp.max(jnp.abs(new["w"] - params["w"]))) <= 0.1 + 1e-6


def test_adafactor_trains_tinygpt_step():
    from taper_tpu import models
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Adafactor(lr=0.05)
    state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        return masked_token_loss(model.apply(params, toks), tgts, mask)

    @jax.jit
    def step(params, state, key):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        params, state = opt.update(g, state, params)
        return params, state, l

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


# ---------------------------------------------------------------------------
# Lion (sign-of-momentum) and Muon (Newton-Schulz orthogonalized momentum)
# — beyond-reference optimizers.
# ---------------------------------------------------------------------------

def test_lion_update_semantics_and_frozen_leaves():
    params = {"w": jnp.ones((4, 4)), "running_mean": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), -2.0), "running_mean": jnp.ones((4,))}
    opt = optim.Lion(lr=0.01, weight_decay=0.5)
    state = opt.init(params)
    new, state = opt.update(grads, state, params)
    # first step: m=0, sign((1-b1)*g) = sign(g) = -1 everywhere;
    # decoupled wd shrinks first, then the sign step of exactly lr
    want = 1.0 * (1.0 - 0.01 * 0.5) + 0.01
    np.testing.assert_allclose(np.asarray(new["w"]),
                               np.full((4, 4), want), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(new["running_mean"]),
                                  np.zeros((4,)))
    # momentum accumulated with b2
    np.testing.assert_allclose(np.asarray(state["m"]["w"]),
                               np.full((4, 4), -2.0 * 0.01), rtol=1e-6)


def test_lion_trains_regression():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    Wtrue = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    Y = X @ Wtrue
    params = {"w": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}
    opt = optim.Lion(lr=0.02)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda p: jnp.mean((X @ p["w"] + p["b"] - Y) ** 2))(p)
        return *opt.update(g, s, p), l

    losses = []
    for _ in range(300):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])


def test_newton_schulz_orthogonalizes():
    rng = np.random.default_rng(1)
    for shape in ((64, 32), (32, 64), (48, 48)):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        o = optim.newton_schulz_orthogonalize(x, steps=5)
        assert o.shape == x.shape
        sv = np.linalg.svd(np.asarray(o, np.float64), compute_uv=False)
        # NS(5) flattens the spectrum to ~[0.7, 1.3]; allow slack
        assert sv.min() > 0.4 and sv.max() < 1.6, (shape, sv.min(), sv.max())
        assert abs(float(sv.mean()) - 1.0) < 0.25
        # the orthogonalized update preserves the row/col space direction:
        # sign of alignment with the original is positive
        assert float(jnp.sum(o * x)) > 0.0


def test_muon_matrix_vs_adam_split():
    params = {"blocks": {"w": jnp.ones((8, 4))},
              "tok": {"w": jnp.ones((6, 4))},       # excluded -> adam
              "b": jnp.zeros((4,)),                 # vector -> adam
              "running_var": jnp.ones((4,))}        # frozen
    grads = jax.tree.map(lambda p: jnp.full(p.shape, 0.1), params)
    opt = optim.Muon(lr=0.02, adam_lr=1e-3)
    state = opt.init(params)
    # v placeholder is scalar for muon-managed matrices, full elsewhere
    assert state["v"]["blocks"]["w"].shape == ()
    assert state["v"]["tok"]["w"].shape == (6, 4)
    new, state = opt.update(grads, state, params)
    assert not np.allclose(np.asarray(new["blocks"]["w"]), 1.0)
    assert not np.allclose(np.asarray(new["tok"]["w"]), 1.0)
    assert not np.allclose(np.asarray(new["b"]), 0.0)
    np.testing.assert_array_equal(np.asarray(new["running_var"]),
                                  np.ones((4,)))
    # adam leaves accumulated a second moment; muon placeholder untouched
    assert float(jnp.max(state["v"]["tok"]["w"])) > 0.0
    assert float(state["v"]["blocks"]["w"]) == 0.0
    # set_lr preserves the muon/adam ratio (scheduler plumbing)
    state = optim.Muon.set_lr(state, 0.01)
    assert float(state["lr"]) == np.float32(0.01)


def test_muon_trains_tinygpt_step():
    from taper_tpu import models
    from taper_tpu.data.seq import masked_token_loss, sort_task_batch

    model = models.TinyGPT(vocab_size=12, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optim.Muon(lr=0.02, adam_lr=3e-3)
    state = opt.init(params)

    def loss_fn(params, key):
        toks, tgts, mask = sort_task_batch(key, 16, 7)
        return masked_token_loss(model.apply(params, toks), tgts, mask)

    @jax.jit
    def step(params, state, key):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key)
        params, state = opt.update(g, state, params)
        return params, state, l

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        key, k = jax.random.split(key)
        params, state, l = step(params, state, k)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
