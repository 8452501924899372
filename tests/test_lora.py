"""LoRA adapter tests: zero-init identity, target selection, fine-tuning
with factor-only optimizer state, and serve-time merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taper_tpu import models, optim
from taper_tpu.nn.lora import LoRA, default_match


def _tiny():
    model = models.TinyGPT(vocab_size=37, dim=32, depth=2, num_heads=2,
                           max_seq=16, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_lora_init_is_identity_and_targets_projections():
    model, params = _tiny()
    lora = LoRA(rank=4, alpha=8.0)
    lp = lora.init(jax.random.PRNGKey(1), params)

    # Matched leaves: every block's wq/wk/wv/wo/w1/w2; NOT embeddings/LN.
    flat = jax.tree_util.tree_flatten_with_path(
        lp, is_leaf=lambda x: x is None or (isinstance(x, dict)
                                            and set(x) == {"a", "b"}))[0]
    names = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path): leaf
             for path, leaf in flat}
    matched = {n for n, l in names.items() if l is not None}
    assert any(n.endswith("wq") for n in matched)
    assert any(n.endswith("w2") for n in matched)
    assert all("tok" not in n and "pos" not in n and "ln" not in n
               for n in matched)
    # 2 blocks x 6 projections
    assert len(matched) == 12

    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 37)
    base_out = model.apply(params, toks)
    patched_out = model.apply(lora.patch(params, lp), toks)
    np.testing.assert_allclose(np.asarray(base_out),
                               np.asarray(patched_out), atol=0)  # exact


def test_lora_finetune_learns_with_factor_only_state():
    model, params = _tiny()
    lora = LoRA(rank=4, alpha=8.0)
    lp = lora.init(jax.random.PRNGKey(1), params)

    # Factor params are ~100x smaller than the base.
    n_lora = lora.param_count(lp)
    n_base = model.param_count(params)
    assert n_lora < n_base / 5

    toks = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, 37)
    tgts = jnp.roll(toks, -1, axis=1)

    opt = optim.Adam(1e-2)
    state = opt.init(lp)
    # Optimizer state covers ONLY the factors (the LoRA memory win).
    assert sum(x.size for x in jax.tree_util.tree_leaves(state["m"])) \
        == n_lora

    def loss_of(lp_):
        logits = model.apply(lora.patch(params, lp_), toks)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, tgts[..., None], -1))

    @jax.jit
    def step(lp_, state):
        l, g = jax.value_and_grad(loss_of)(lp_)
        lp_, state = opt.update(g, state, lp_)
        return lp_, state, l

    losses = []
    for _ in range(30):
        lp, state, l = step(lp, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.1   # actually learns
    # Base tree untouched by construction (it was never updated).


def test_lora_merge_equals_patched_apply():
    model, params = _tiny()
    lora = LoRA(rank=2, alpha=4.0)
    lp = lora.init(jax.random.PRNGKey(1), params)
    # Give b nonzero values so the adapter is active.
    lp = jax.tree.map(
        lambda f: ({"a": f["a"],
                    "b": jnp.ones_like(f["b"]) * 0.01}
                   if f is not None else None),
        lp, is_leaf=lambda x: x is None or (isinstance(x, dict)
                                            and set(x) == {"a", "b"}))
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 37)
    merged = lora.merge(params, lp)
    np.testing.assert_allclose(
        np.asarray(model.apply(merged, toks)),
        np.asarray(model.apply(lora.patch(params, lp), toks)),
        rtol=1e-6, atol=1e-6)


def test_lora_exclude_and_match_filters():
    model, params = _tiny()
    lora = LoRA(rank=2, exclude=("mlp",))
    lp = lora.init(jax.random.PRNGKey(1), params)
    flat = jax.tree_util.tree_flatten_with_path(
        lp, is_leaf=lambda x: x is None or (isinstance(x, dict)
                                            and set(x) == {"a", "b"}))[0]
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path)
        if "mlp" in p:
            assert leaf is None

    with pytest.raises(ValueError):
        LoRA(rank=0)

    # default_match rejects 1-D and non-w leaves directly
    class E:                      # fake path entry
        def __init__(self, key):
            self.key = key
    assert not default_match((E("g"),), jnp.ones((4, 4)))
    assert not default_match((E("w"),), jnp.ones((4,)))
    assert default_match((E("blocks"), E("0"), E("wq")), jnp.ones((4, 4)))
    assert not default_match((E("tok"), E("w")), jnp.ones((4, 4)))


def test_qlora_over_quantized_base():
    """LoRA over a PTQ-quantized base (QLoRA): factors train in f32 on
    top of frozen int8 weights that never dequantize in storage."""
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig
    from taper_tpu.quantization.qtensor import QuantizedTensor

    model, params = _tiny()
    qparams = ptq.quantize_params(params, QuantizationConfig.int8())
    # sanity: projections really are quantized leaves now
    assert isinstance(qparams["blocks"][0]["attn"]["wq"], QuantizedTensor)

    lora = LoRA(rank=4, alpha=8.0)
    lp = lora.init(jax.random.PRNGKey(1), qparams)
    flat = jax.tree_util.tree_flatten_with_path(
        lp, is_leaf=lambda x: x is None or (isinstance(x, dict)
                                            and set(x) == {"a", "b"}))[0]
    matched = [l for _, l in flat if l is not None]
    assert len(matched) == 12                    # same targets as dense
    assert all(l["a"].dtype == jnp.float32 for l in matched)

    toks = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, 37)
    # zero-init adapter: patched quantized model == plain quantized model
    np.testing.assert_allclose(
        np.asarray(model.apply(lora.patch(qparams, lp), toks)),
        np.asarray(model.apply(qparams, toks)), atol=1e-6)

    # fine-tune ONLY the factors; the quantized base bytes never change
    tgts = jnp.roll(toks, -1, axis=1)
    opt = optim.Adam(1e-2)
    state = opt.init(lp)

    def loss_of(lp_):
        logits = model.apply(lora.patch(qparams, lp_), toks)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, tgts[..., None], -1))

    @jax.jit
    def step(lp_, state):
        l, g = jax.value_and_grad(loss_of)(lp_)
        lp_, state = opt.update(g, state, lp_)
        return lp_, state, l

    losses = []
    for _ in range(30):
        lp, state, l = step(lp, state)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.1
    # base stays quantized: storage is the int8 bytes, not dense f32
    assert isinstance(qparams["blocks"][0]["attn"]["wq"], QuantizedTensor)


def test_qlora_fp8_base():
    """fp8_e4m3 base weights work through the same QLoRA path (any
    QuantizedTensor dequantizes inside the trace)."""
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig
    from taper_tpu.quantization.qtensor import QuantizedTensor
    from taper_tpu.nn.lora import LoRA

    model = models.TinyGPT(vocab_size=37, dim=32, depth=1, num_heads=2,
                           max_seq=16)
    params = model.init(jax.random.PRNGKey(0))
    qparams = ptq.quantize_params(params, QuantizationConfig.fp8_e4m3())
    qparams["tok"], qparams["pos"] = params["tok"], params["pos"]
    lora = LoRA(rank=4)
    lp = lora.init(jax.random.PRNGKey(1), qparams)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 37)
    np.testing.assert_allclose(
        np.asarray(model.apply(lora.patch(qparams, lp), toks)),
        np.asarray(model.apply(qparams, toks)), atol=1e-6)
    assert isinstance(qparams["blocks"][0]["attn"]["wq"],
                      QuantizedTensor)
    assert qparams["blocks"][0]["attn"]["wq"].values.dtype.itemsize == 1
