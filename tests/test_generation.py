"""Generation-path regression tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taper_tpu import models


def test_speculative_full_acceptance_backfill_path():
    """draft == target (greedy): every round accepts all gamma drafts,
    exercising the draft-cache backfill (the n_acc == gamma hole fix);
    output must equal plain greedy generate."""
    model = models.TinyGPT(vocab_size=29, dim=32, depth=2, num_heads=4,
                           max_seq=96, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 29)
    ref = model.generate(params, prompt, 17)
    out, stats = model.speculative_generate(
        params, model, params, prompt, 17, gamma=3, return_stats=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # full acceptance every round: ~max_new/(gamma+1) target dispatches
    assert int(stats["rounds"]) <= -(-17 // 4) + 1


def test_generate_continued_rejects_cache_after_eos():
    model = models.TinyGPT(vocab_size=29, dim=32, depth=2, num_heads=4,
                           max_seq=96, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 29)
    _, caches = model.generate(params, prompt, 4, return_cache=True)
    with pytest.raises(ValueError, match="partially filled"):
        model.generate_continued(params, prompt[:, :2], 4, caches,
                                 past_len=9, eos_token=3,
                                 return_cache=True)
