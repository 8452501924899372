"""Continuous-batching serving engine (taper_tpu/serve.py).

Per-row outputs must be EXACTLY what model.generate produces for that
request alone (greedy decode is row-independent), regardless of batch
composition, slot reuse order, or decode-block boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import models
from taper_tpu.serve import ServingEngine


def _model_and_params(seed=0):
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    return model, model.init(jax.random.PRNGKey(seed))


def _ref_generate(model, params, prompt, max_new, eos_token=None):
    out = model.generate(params, jnp.asarray(prompt, jnp.int32)[None],
                         max_new, eos_token=eos_token)
    gen = np.asarray(out)[0, len(prompt):]
    if eos_token is not None and eos_token in gen:
        gen = gen[:int(np.argmax(gen == eos_token)) + 1]
    return list(map(int, gen))


def test_engine_matches_standalone_generate():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 32, rng.integers(3, 9)))
               for _ in range(5)]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3)
    ids = [eng.submit(p, max_new=6) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        assert out[rid] == _ref_generate(model, params, p, 6), rid


def test_engine_eos_retires_and_reuses_slots():
    model, params = _model_and_params(seed=1)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, 32, 5)) for _ in range(4)]
    # pick an eos each row WILL emit: the 3rd greedy token of prompt 0
    probe = _ref_generate(model, params, prompts[0], 8)
    eos = probe[2]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=4, eos_token=eos)
    ids = [eng.submit(p, max_new=10) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = _ref_generate(model, params, p, 10, eos_token=eos)
        assert out[rid] == ref, (rid, out[rid], ref)
    # slot count never grew: more requests than slots were served
    assert len(out) == 4


def test_engine_mixed_lengths_and_single_token():
    model, params = _model_and_params(seed=2)
    eng = ServingEngine(model, params, slots=3, prompt_pad=8,
                        decode_block=2)
    a = eng.submit([1], max_new=1)          # retire at admission
    b = eng.submit([2, 3, 4, 5, 6, 7, 8, 9], max_new=5)   # full pad
    out = eng.run()
    assert out[a] == _ref_generate(model, params, [1], 1)
    assert out[b] == _ref_generate(model, params,
                                   [2, 3, 4, 5, 6, 7, 8, 9], 5)


def test_offline_serve_matches_standalone_generate():
    """On-device continuous batching (single while_loop dispatch):
    per-request greedy tokens == standalone generate, across mixed
    prompt lengths, per-request budgets, and slots < N."""
    model, params = _model_and_params(seed=3)
    from taper_tpu.serve import offline_serve
    rng = np.random.default_rng(3)
    n = 6
    prompts = np.zeros((n, 8), np.int32)
    lens, budgets = [], []
    for i in range(n):
        L = int(rng.integers(3, 9))
        prompts[i, :L] = rng.integers(0, 32, L)
        lens.append(L)
        budgets.append(int(rng.integers(1, 8)))
    out, n_tok = offline_serve(model, params, prompts, lens, budgets,
                               slots=2)
    for i in range(n):
        ref = _ref_generate(model, params,
                            list(prompts[i, :lens[i]]), budgets[i])
        assert int(n_tok[i]) == budgets[i]
        assert list(map(int, np.asarray(out)[i, :budgets[i]])) == ref, i


def test_offline_serve_eos():
    model, params = _model_and_params(seed=4)
    from taper_tpu.serve import offline_serve
    rng = np.random.default_rng(4)
    prompts = rng.integers(0, 32, (4, 5)).astype(np.int32)
    probe = _ref_generate(model, params, list(prompts[0]), 8)
    eos = probe[1]                  # fires fast for at least one row
    out, n_tok = offline_serve(model, params, prompts, [5] * 4,
                               [10] * 4, slots=2, eos_token=eos)
    for i in range(4):
        ref = _ref_generate(model, params, list(prompts[i]), 10,
                            eos_token=eos)
        k = int(n_tok[i])
        assert k == len(ref), (i, k, ref)
        assert list(map(int, np.asarray(out)[i, :k])) == ref, i
        assert not np.any(np.asarray(out)[i, k:])      # zero-padded
