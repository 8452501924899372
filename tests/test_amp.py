"""Mixed-precision policy + loss scaling (taper_tpu/utils/amp.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu.utils import amp


def test_policy_from_string_and_casting():
    p = amp.Policy.from_string("p=f32,c=bf16,o=f32")
    assert p.compute_dtype == jnp.bfloat16
    assert p.param_dtype == jnp.float32
    long = amp.Policy.from_string(
        "params=float32, compute=bfloat16, output=float32")
    assert long == p

    tree = {"w": jnp.ones((3,), jnp.float32),
            "step": jnp.zeros((), jnp.int32)}
    ct = p.cast_to_compute(tree)
    assert ct["w"].dtype == jnp.bfloat16
    assert ct["step"].dtype == jnp.int32          # ints pass through
    back = p.cast_to_param(ct)
    assert back["w"].dtype == jnp.float32

    tp = amp.tpu_bf16_policy()
    assert tp.compute_dtype == jnp.bfloat16


def test_all_finite():
    assert bool(amp.all_finite({"a": jnp.ones(3)}))
    assert not bool(amp.all_finite(
        {"a": jnp.ones(3), "b": jnp.asarray([jnp.inf])}))
    assert not bool(amp.all_finite({"a": jnp.asarray([jnp.nan])}))
    assert bool(amp.all_finite({"n": jnp.zeros((2,), jnp.int32)}))


def test_dynamic_scale_schedule():
    ls = amp.DynamicLossScale(initial=2.0 ** 10, growth_interval=3)
    s = ls.init()
    # two finite steps: counter advances, scale held
    s = ls.adjust(s, True)
    s = ls.adjust(s, True)
    assert float(s.scale) == 2.0 ** 10 and int(s.good_steps) == 2
    # third finite step: double, counter resets
    s = ls.adjust(s, True)
    assert float(s.scale) == 2.0 ** 11 and int(s.good_steps) == 0
    # overflow: halve, counter resets
    s = ls.adjust(s, True)
    s = ls.adjust(s, False)
    assert float(s.scale) == 2.0 ** 10 and int(s.good_steps) == 0
    # floor at 1
    tiny = amp.LossScaleState(jnp.float32(1.0), jnp.int32(0))
    assert float(ls.adjust(tiny, False).scale) == 1.0


def test_scaling_rescues_f16_underflow():
    """A gradient that underflows to zero when it crosses back into an
    f16 trunk (f16 min subnormal ≈ 6e-8) survives when the loss is
    pre-scaled — the reason loss scaling exists."""
    ls = amp.StaticLossScale(2.0 ** 15)
    state = ls.init()
    w = jnp.asarray([1.0], jnp.float32)

    def loss_fn(w):
        h = w.astype(jnp.float16)                 # f16 trunk boundary
        return jnp.sum(h.astype(jnp.float32)) * 1e-8

    # unscaled: dL/dh = 1e-8 is cast to f16 at the boundary -> 0
    g_plain = jax.grad(loss_fn)(w)
    assert float(g_plain[0]) == 0.0               # underflowed
    g, loss, _, fin, state = amp.scaled_grad_step(
        loss_fn, w, ls, state)
    assert bool(fin)
    np.testing.assert_allclose(float(g[0]), 1e-8, rtol=0.05)


def test_apply_if_finite_skips_overflow_steps():
    from taper_tpu import optim

    opt = optim.SGD(0.1)
    params = {"w": jnp.ones((2,), jnp.float32)}
    st = opt.init(params)
    good = {"w": jnp.ones((2,), jnp.float32)}
    bad = {"w": jnp.asarray([jnp.inf, 1.0], jnp.float32)}

    p1, st1 = amp.apply_if_finite(opt, good, st, params,
                                  amp.all_finite(good))
    np.testing.assert_allclose(np.asarray(p1["w"]), 0.9)
    p2, st2 = amp.apply_if_finite(opt, bad, st, params,
                                  amp.all_finite(bad))
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0)  # held
    for a, b in zip(jax.tree.leaves(st2), jax.tree.leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_f16_training_end_to_end_with_dynamic_scale():
    """Linear regression with an f16-compute trunk: dynamic-scale
    training converges, and deliberately-injected overflow steps are
    skipped without derailing it."""
    from taper_tpu import optim

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    true_w = jnp.asarray([0.5, -1.0, 2.0, 0.25])
    y = X @ true_w
    policy = amp.Policy(jnp.float32, jnp.float16, jnp.float32)

    def loss_fn(params, x, t):
        p16 = policy.cast_to_compute(params)
        pred = (x.astype(jnp.float16) @ p16["w"]).astype(jnp.float32)
        return jnp.mean((pred - t) ** 2) * 1e-4   # tiny: f16 underflows

    ls = amp.DynamicLossScale(initial=2.0 ** 12, growth_interval=5)
    opt = optim.SGD(100.0)  # compensates the 1e-4 loss scaling
    params = {"w": jnp.zeros((4,), jnp.float32)}
    opt_state = opt.init(params)
    ls_state = ls.init()

    @jax.jit
    def step(params, opt_state, ls_state, x, t):
        g, loss, _, fin, ls_state = amp.scaled_grad_step(
            loss_fn, params, ls, ls_state, x, t)
        params, opt_state = amp.apply_if_finite(opt, g, opt_state,
                                                params, fin)
        return params, opt_state, ls_state, loss, fin

    for i in range(300):
        params, opt_state, ls_state, loss, fin = step(
            params, opt_state, ls_state, X, y)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               np.asarray(true_w), atol=0.05)
    # scale grew from its start (finite steps all the way)
    assert float(ls_state.scale) > 2.0 ** 12

    # inject an overflowing batch: f16 products blow past 65504 -> inf
    # loss -> non-finite grads -> the step is SKIPPED and the scale
    # halves, instead of poisoning the params
    scale_before = float(ls_state.scale)
    p2, _, ls2, _, fin2 = step(params, opt_state, ls_state,
                               X * jnp.float32(5e4), y)
    assert not bool(fin2)
    np.testing.assert_allclose(np.asarray(p2["w"]),
                               np.asarray(params["w"]))
    assert float(ls2.scale) == scale_before / 2
