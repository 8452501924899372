"""Multi-tenant LoRA serving: per-request adapters in one decode batch
(BankedLoRA leaves consumed by nn.transformer._proj).

Equality contract: a request routed through adapter k produces the
same tokens as standalone generate over ``lora.merge(base, adapter_k)``
— and base requests (adapter=None) match the unadapted model — all
while sharing one batched decode program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taper_tpu import models
from taper_tpu.nn.lora import LoRA, BankedLoRA
from taper_tpu.serve import ServingEngine


def _setup(seed=0, n_adapters=2, rank=4):
    model = models.TinyGPT(vocab_size=32, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(seed))
    lora = LoRA(rank=rank, alpha=8.0)
    adapters = []
    for i in range(n_adapters):
        f = lora.init(jax.random.PRNGKey(100 + i), params)
        # give b random values so each adapter genuinely changes the
        # model (init zeros b => identity)
        f = jax.tree.map(
            lambda x: (jax.random.normal(
                jax.random.PRNGKey(hash(str(x.shape)) % 1000 + i),
                x.shape) * 0.05 if x.ndim == 2 and x.shape[1] == rank
                else x),
            f)
        adapters.append(f)
    bank = lora.stack_adapters(adapters)
    return model, params, lora, adapters, bank


def test_banked_proj_matches_per_row_patch():
    """decode_step over banked params == each row decoded with its own
    patch()ed tree."""
    model, params, lora, adapters, bank = _setup()
    toks = jnp.asarray([3, 7, 11], jnp.int32)
    pos = jnp.asarray([4, 4, 4], jnp.int32)
    caches = model.init_cache(3)
    # fill some cache history with the BASE model (same for all rows)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (3, 4), 0, 32)
    _, caches = model.prefill(params, prompt, caches)

    ids = jnp.asarray([0, 1, -1], jnp.int32)
    banked = lora.bank_patch(params, bank, ids)
    lg_banked, _ = model.decode_step(banked, toks, pos, caches)

    for row, aid in enumerate([0, 1, None]):
        p_row = (params if aid is None
                 else lora.patch(params, adapters[aid]))
        c_row = jax.tree.map(lambda c: c[row:row + 1], caches)
        lg_row, _ = model.decode_step(p_row, toks[row:row + 1],
                                      pos[row:row + 1], c_row)
        np.testing.assert_allclose(np.asarray(lg_banked[row]),
                                   np.asarray(lg_row[0]),
                                   rtol=2e-5, atol=2e-5)


def test_bank_patch_requires_matching_rows():
    model, params, lora, adapters, bank = _setup()
    banked = lora.bank_patch(params, bank, jnp.asarray([0], jnp.int32))
    with pytest.raises(AssertionError, match="row ids"):
        model.apply(banked, jnp.zeros((2, 4), jnp.int32))


@pytest.mark.parametrize("paged", [False, True])
def test_engine_multi_tenant_adapters(paged):
    """Requests on adapters 0/1/base share slots and decode batches;
    each emits exactly its own model's tokens."""
    model, params, lora, adapters, bank = _setup(seed=2)
    rng = np.random.default_rng(2)
    cases = []
    for i in range(6):
        prompt = list(rng.integers(0, 32, rng.integers(3, 8)))
        cases.append((prompt, [0, 1, None][i % 3]))
    kw = dict(pool_blocks=12, block_size=8) if paged else {}
    eng = ServingEngine(model, params, slots=2, prompt_pad=8,
                        decode_block=3, lora=lora, lora_bank=bank,
                        paged_impl="xla" if paged else None, **kw)
    ids = [eng.submit(p, max_new=6, adapter=a) for p, a in cases]
    out = eng.run()
    for rid, (prompt, aid) in zip(ids, cases):
        p_full = (params if aid is None
                  else lora.merge(params, adapters[aid]))
        ref = model.generate(p_full,
                             jnp.asarray(prompt, jnp.int32)[None], 6)
        ref = list(map(int, np.asarray(ref)[0, len(prompt):]))
        assert out[rid] == ref, (rid, aid, out[rid], ref)


def test_engine_adapter_requires_bank():
    model, params, lora, adapters, bank = _setup()
    eng = ServingEngine(model, params, slots=2, prompt_pad=8)
    with pytest.raises(AssertionError, match="lora_bank"):
        eng.submit([1, 2, 3], max_new=4, adapter=0)
