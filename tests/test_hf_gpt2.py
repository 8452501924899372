"""GPT-2 weight interop (models/hf.py): TinyGPT must reproduce the
torch reference model's logits and greedy generations from converted
weights.  Random-init HF models (zero-egress environment); the mapping
is checkpoint-independent."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from taper_tpu import ops
from taper_tpu.models.hf import from_hf_gpt2


def _hf_model(seed=0, **kw):
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(seed)
    cfg = GPT2Config(vocab_size=97, n_positions=64, n_embd=48,
                     n_layer=3, n_head=4, resid_pdrop=0.0,
                     embd_pdrop=0.0, attn_pdrop=0.0, **kw)
    return GPT2LMHeadModel(cfg).eval()


def test_logits_match_torch_reference():
    ops.set_backend("xla")
    hf = _hf_model()
    model, params = from_hf_gpt2(hf)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 97, (2, 17))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_greedy_generate_matches_torch():
    hf = _hf_model(seed=1)
    model, params = from_hf_gpt2(hf)
    prompt = [[5, 9, 23, 41]]
    with torch.no_grad():
        ref = hf.generate(torch.tensor(prompt), max_new_tokens=10,
                          do_sample=False, pad_token_id=0)
    got = model.generate(params, jnp.asarray(prompt, jnp.int32), 10)
    np.testing.assert_array_equal(np.asarray(got), ref.numpy())


def test_converted_model_serves_with_kv_cache_and_ptq():
    """Converted weights ride the full serving stack: KV-cache ragged
    generate equals the full-forward path, and int8 PTQ applies."""
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig

    hf = _hf_model(seed=2)
    model, params = from_hf_gpt2(hf)
    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    cached = model.generate(params, prompt, 8)
    # oracle: token-at-a-time via full forwards
    toks = prompt
    for _ in range(8):
        lg = model.apply(params, toks)
        nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
        toks = jnp.concatenate([toks, nxt], axis=1)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(toks))

    qparams = ptq.quantize_params(params, QuantizationConfig.int8())
    out = model.generate(qparams, prompt, 4)
    assert out.shape == (1, 9)


def _hf_llama(seed=0, **kw):
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(seed)
    cfg = LlamaConfig(vocab_size=89, hidden_size=48,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=64, rms_norm_eps=1e-6,
                      attention_dropout=0.0, **kw)
    return LlamaForCausalLM(cfg).eval()


def test_llama_logits_match_torch_reference():
    from taper_tpu.models.hf import from_hf_llama
    ops.set_backend("xla")
    hf = _hf_llama()
    model, params = from_hf_llama(hf)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 89, (2, 13))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_llama_greedy_generate_matches_torch():
    from taper_tpu.models.hf import from_hf_llama
    hf = _hf_llama(seed=3)
    model, params = from_hf_llama(hf)
    prompt = [[7, 2, 31, 8, 44]]
    with torch.no_grad():
        ref = hf.generate(torch.tensor(prompt), max_new_tokens=8,
                          do_sample=False, pad_token_id=0)
    got = model.generate(params, jnp.asarray(prompt, jnp.int32), 8)
    np.testing.assert_array_equal(np.asarray(got), ref.numpy())
