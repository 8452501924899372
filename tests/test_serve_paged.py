"""Paged-pool serving engine (ServingEngine(pool_blocks=...)).

Same contract as the contiguous engine: per-row outputs EXACTLY equal
standalone ``model.generate``'s, now with the KV cache living in an
OVERSUBSCRIBED shared block pool (smaller than slots × max_seq) managed
by the host-side BlockAllocator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taper_tpu import models
from taper_tpu.serve import BlockAllocator, ServingEngine


def _model_and_params(seed=0, **kw):
    cfg = dict(vocab_size=32, dim=32, depth=2, num_heads=4, max_seq=64,
               rope=True)
    cfg.update(kw)
    model = models.TinyGPT(**cfg)
    return model, model.init(jax.random.PRNGKey(seed))


def _ref_generate(model, params, prompt, max_new, eos_token=None):
    out = model.generate(params, jnp.asarray(prompt, jnp.int32)[None],
                         max_new, eos_token=eos_token)
    gen = np.asarray(out)[0, len(prompt):]
    if eos_token is not None and eos_token in gen:
        gen = gen[:int(np.argmax(gen == eos_token)) + 1]
    return list(map(int, gen))


def test_block_allocator():
    a = BlockAllocator(5)
    ids = a.alloc(3)
    assert sorted(ids) == [0, 1, 2] and a.available == 2
    a.free(ids[:2])
    assert a.available == 4
    with pytest.raises(RuntimeError, match="exhausted"):
        a.alloc(5)
    assert a.available == 4            # failed alloc takes nothing


def test_paged_engine_matches_standalone_generate():
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 32, rng.integers(3, 9)))
               for _ in range(5)]
    # contiguous equivalent would be slots*max_seq = 2*64 = 16 blocks
    # of 8; give the pool 9 (1 is the trash block) -> oversubscribed
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3, pool_blocks=9, block_size=8)
    ids = [eng.submit(p, max_new=6) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        assert out[rid] == _ref_generate(model, params, p, 6), rid


def test_paged_engine_gqa_and_eos():
    model, params = _model_and_params(seed=1, num_heads=4,
                                      num_kv_heads=2)
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, 32, 5)) for _ in range(4)]
    probe = _ref_generate(model, params, prompts[0], 8)
    eos = probe[2]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=4, eos_token=eos,
                        pool_blocks=11, block_size=8)
    ids = [eng.submit(p, max_new=10) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = _ref_generate(model, params, p, 10, eos_token=eos)
        assert out[rid] == ref, (rid, out[rid], ref)


def test_paged_admission_defers_until_blocks_free():
    """A pool that fits only ONE in-flight request at a time: admission
    must defer (head-of-line wait) and every request still completes
    with exact outputs."""
    model, params = _model_and_params(seed=2)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, 32, 7)) for _ in range(3)]
    # need per request = max(ceil(8/8), ceil((7+8)/8)) = 2 blocks;
    # 4 slots all free but only 3 usable blocks -> one request at a time
    eng = ServingEngine(model, params, slots=4, prompt_pad=8,
                        decode_block=2, pool_blocks=4, block_size=8)
    ids = [eng.submit(p, max_new=8) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        assert out[rid] == _ref_generate(model, params, p, 8), rid
    assert eng._alloc.available == 3   # everything returned


def test_paged_impossible_request_rejected():
    model, params = _model_and_params()
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=2, pool_blocks=2, block_size=8)
    with pytest.raises(AssertionError, match="never"):
        eng.submit([1, 2, 3], max_new=20)


def test_paged_quantized_engine_matches_quantized_generate():
    """int8 paged pools in the engine vs standalone generate with the
    contiguous int8 cache — same per-position quantization, so outputs
    agree exactly."""
    model, params = _model_and_params(seed=4)
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, 32, rng.integers(3, 8)))
               for _ in range(4)]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3, pool_blocks=9, block_size=8,
                        quantized_cache=True)
    ids = [eng.submit(p, max_new=6) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = model.generate(params, jnp.asarray(p, jnp.int32)[None],
                             6, quantized_cache=True)
        ref = list(map(int, np.asarray(ref)[0, len(p):]))
        assert out[rid] == ref, (rid, out[rid], ref)


def test_paged_engine_shared_system_prompt():
    """system_prompt prefix blocks are allocated ONCE and aliased by
    every slot; outputs equal standalone generate(system + user)."""
    model, params = _model_and_params(seed=6)
    rng = np.random.default_rng(6)
    system = list(rng.integers(0, 32, 16))      # 2 blocks of 8
    users = [list(rng.integers(0, 32, rng.integers(2, 8)))
             for _ in range(5)]
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3, pool_blocks=12, block_size=8,
                        system_prompt=system)
    # prefix takes 2 blocks + 1 trash -> 9 usable for requests
    assert eng._alloc.available == 9
    assert len(eng._prefix_blocks) == 2
    ids = [eng.submit(u, max_new=6) for u in users]
    out = eng.run()
    for rid, u in zip(ids, users):
        full = jnp.asarray(system + u, jnp.int32)[None]
        ref = model.generate(params, full, 6)
        ref = list(map(int, np.asarray(ref)[0, len(system) + len(u):]))
        assert out[rid] == ref, (rid, out[rid], ref)
    # prefix blocks still allocated (engine-lifetime), slots' freed
    assert eng._alloc.available == 9


def test_paged_submit_rejects_requests_that_never_fit_past_prefix():
    """Regression: a request needing more blocks than remain after the
    trash + shared-prefix reservations must be rejected at submit()
    (previously it passed the guard and run() busy-looped forever)."""
    model, params = _model_and_params(seed=8)
    rng = np.random.default_rng(8)
    system = list(rng.integers(0, 32, 16))       # 2 prefix blocks
    # pool 12 -> 1 trash + 2 prefix = 9 usable
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=2, pool_blocks=12, block_size=4,
                        system_prompt=None)
    # without prefix: 11 usable; boundary request is accepted
    eng.submit([1] * 8, max_new=36)              # need 11 <= 11
    eng2 = ServingEngine(model, params, slots=2, prompt_pad=8,
                         decode_block=2, pool_blocks=12, block_size=4,
                         system_prompt=system)
    with pytest.raises(AssertionError, match="prefix"):
        # prefix = 4 blocks of 4, usable = 12 - 1 - 4 = 7;
        # need = ceil((16+8+40)/4) - 4 = 12 > 7 (and 64 <= max_seq)
        eng2.submit([1] * 8, max_new=40)


def test_paged_engine_system_prompt_alignment_enforced():
    model, params = _model_and_params()
    with pytest.raises(AssertionError, match="multiple of block_size"):
        ServingEngine(model, params, slots=2, prompt_pad=8,
                      pool_blocks=12, block_size=8,
                      system_prompt=[1, 2, 3])


def test_engine_stats():
    model, params = _model_and_params(seed=5)
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(0, 32, 7)) for _ in range(3)]
    eng = ServingEngine(model, params, slots=4, prompt_pad=8,
                        decode_block=2, pool_blocks=4, block_size=8)
    for p in prompts:
        eng.submit(p, max_new=8)
    st0 = eng.stats()
    assert st0["queued"] == 3 and st0["admitted"] == 0
    eng.run()
    st = eng.stats()
    assert st["admitted"] == 3 and st["completed"] == 3
    assert st["queued"] == 0 and st["active_slots"] == 0
    assert st["tokens_emitted"] >= 3 * 8
    # the 3-usable-block pool forced serialized admissions
    assert st["admission_deferrals"] >= 1
    assert st["pool_blocks_free"] == st["pool_blocks_total"] == 3


def test_paged_engine_with_ptq_weights():
    """int8 PTQ'd weights (dequant-on-load) + paged pools compose: the
    engine's outputs equal standalone generate over the SAME quantized
    params."""
    from taper_tpu.quantization import ptq
    from taper_tpu.quantization.config import QuantizationConfig

    model, params = _model_and_params(seed=7)
    qparams = ptq.quantize_params(params, QuantizationConfig.int8())
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, 32, 6)) for _ in range(3)]
    eng = ServingEngine(model, qparams, slots=2, prompt_pad=8,
                        decode_block=3, pool_blocks=9, block_size=8)
    ids = [eng.submit(p, max_new=5) for p in prompts]
    out = eng.run()
    for rid, p in zip(ids, prompts):
        ref = model.generate(qparams, jnp.asarray(p, jnp.int32)[None],
                             5)
        ref = list(map(int, np.asarray(ref)[0, len(p):]))
        assert out[rid] == ref, (rid, out[rid], ref)


def test_paged_slot_reuse_keeps_outputs_exact():
    """More requests than slots with staggered lengths — blocks free
    and get re-allocated across admissions; outputs stay exact."""
    model, params = _model_and_params(seed=3)
    rng = np.random.default_rng(3)
    cases = [(list(rng.integers(0, 32, rng.integers(2, 8))),
              int(rng.integers(1, 9))) for _ in range(8)]
    eng = ServingEngine(model, params, slots=3, prompt_pad=8,
                        decode_block=3, pool_blocks=10, block_size=8)
    ids = [eng.submit(p, m) for p, m in cases]
    out = eng.run()
    for rid, (p, m) in zip(ids, cases):
        assert out[rid] == _ref_generate(model, params, p, m), rid
