"""safetensors checkpoint interop (utils/safetensors_io.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

st = pytest.importorskip("safetensors")

from taper_tpu import models
from taper_tpu.utils import safetensors_io as sio


def test_params_roundtrip_exact(tmp_path):
    model = models.TinyGPT(vocab_size=31, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "m.safetensors")
    n = sio.save_params(path, params)
    assert n == len(jax.tree.leaves(params))
    back = sio.load_params(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype


def test_load_params_rejects_shape_mismatch(tmp_path):
    model = models.TinyGPT(vocab_size=31, dim=32, depth=1, num_heads=4,
                           max_seq=64)
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "m.safetensors")
    sio.save_params(path, params)
    other = models.TinyGPT(vocab_size=31, dim=64, depth=1, num_heads=4,
                           max_seq=64).init(jax.random.PRNGKey(1))
    with pytest.raises(AssertionError):
        sio.load_params(path, other)


def test_hf_safetensors_file_to_tinygpt(tmp_path):
    """End-to-end: an HF GPT-2 checkpoint saved AS A SAFETENSORS FILE
    loads through load_flat -> params_from_gpt2_state_dict with logit
    parity — the exact flow for a downloaded model.safetensors."""
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel
    from safetensors.numpy import save_file
    from taper_tpu.models.hf import (tinygpt_from_gpt2_config,
                                     params_from_gpt2_state_dict)

    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=67, n_positions=32, n_embd=32,
                     n_layer=2, n_head=4, resid_pdrop=0.0,
                     embd_pdrop=0.0, attn_pdrop=0.0)
    hf = GPT2LMHeadModel(cfg).eval()
    path = str(tmp_path / "model.safetensors")
    save_file({k: v.detach().numpy() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},         # tied, like HF ships
              path)

    model = tinygpt_from_gpt2_config(cfg)
    params = params_from_gpt2_state_dict(model, sio.load_flat(path))
    toks = np.random.default_rng(0).integers(0, 67, (2, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(toks)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(toks, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
