"""Per-request sampling params in the serving engine
(ServingEngine.submit(temperature=..., top_k=..., top_p=...)) and the
vectorized per-row sampler behind them."""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models
from taper_tpu.serve import ServingEngine, _sample_per_row


def _model_and_params(seed=0):
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    return model, model.init(jax.random.PRNGKey(seed))


def test_sample_per_row_greedy_and_top1():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 16)) * 3
    greedy = np.asarray(jnp.argmax(logits, -1))
    # temp 0 rows and top_k=1 rows are both deterministic argmax
    tok, _ = _sample_per_row(logits, jax.random.PRNGKey(1),
                             jnp.asarray([0.0, 0.0, 1.0, 1.0]),
                             jnp.asarray([0, 0, 1, 1]),
                             jnp.asarray([1.0, 1.0, 1.0, 1.0]))
    np.testing.assert_array_equal(np.asarray(tok), greedy)
    # tiny top_p keeps only the argmax token
    tok, _ = _sample_per_row(logits, jax.random.PRNGKey(2),
                             jnp.full((4,), 2.0), jnp.zeros((4,), int),
                             jnp.full((4,), 1e-6))
    np.testing.assert_array_equal(np.asarray(tok), greedy)


def test_sample_per_row_respects_per_row_topk():
    """Sampled tokens always come from each ROW'S OWN top-k set."""
    logits = jax.random.normal(jax.random.PRNGKey(3), (3, 32))
    temps = jnp.asarray([1.5, 1.5, 1.5])
    topks = jnp.asarray([2, 5, 32])
    topps = jnp.ones((3,))
    order = np.asarray(jnp.argsort(-logits, axis=-1))
    key = jax.random.PRNGKey(4)
    for i in range(50):
        key, sk = jax.random.split(key)
        tok, _ = _sample_per_row(logits, sk, temps, topks, topps)
        for r in range(3):
            assert int(tok[r]) in set(order[r, :int(topks[r])]), (i, r)


def test_engine_mixed_greedy_and_sampled_requests():
    """Greedy requests sharing a decode batch with sampled ones still
    produce EXACTLY standalone generate's tokens (row independence
    extends to per-row sampling configs)."""
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    greedy_prompts = [list(rng.integers(0, 32, 5)) for _ in range(3)]
    hot_prompts = [list(rng.integers(0, 32, 5)) for _ in range(3)]
    eng = ServingEngine(model, params, slots=3, prompt_pad=8,
                        decode_block=3, temperature=0.0)
    gids = [eng.submit(p, max_new=6) for p in greedy_prompts]
    hids = [eng.submit(p, max_new=6, temperature=1.2, top_k=8)
            for p in hot_prompts]
    out = eng.run()
    for rid, p in zip(gids, greedy_prompts):
        ref = model.generate(params, jnp.asarray(p, jnp.int32)[None], 6)
        assert out[rid] == list(map(int, np.asarray(ref)[0, 5:])), rid
    for rid in hids:                      # sampled rows: valid tokens
        assert len(out[rid]) == 6
        assert all(0 <= t < 32 for t in out[rid])


def test_engine_per_request_top1_is_deterministic_greedy():
    """temperature>0 with top_k=1 must equal the greedy output — the
    per-request filter, not the engine default, decides."""
    model, params = _model_and_params(seed=2)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, 32, 6)) for _ in range(4)]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=4, temperature=5.0)  # hot default
    ids = [eng.submit(p, max_new=5, top_k=1) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = model.generate(params, jnp.asarray(p, jnp.int32)[None], 5)
        assert out[rid] == list(map(int, np.asarray(ref)[0, 6:])), rid


def test_engine_paged_with_per_request_sampling():
    """Per-request params work identically on the paged engine."""
    model, params = _model_and_params(seed=3)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(0, 32, 5)) for _ in range(4)]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3, temperature=2.0,
                        pool_blocks=9, block_size=8)
    ids = [eng.submit(p, max_new=6, temperature=0.0) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = model.generate(params, jnp.asarray(p, jnp.int32)[None], 6)
        assert out[rid] == list(map(int, np.asarray(ref)[0, 5:])), rid
