"""AOT compilation + serialized serving programs (utils/aot.py).

The deserialize tests intentionally run the artifact through a callable
built ONLY from the serialized bytes — proving a serving process needs
neither the model code nor a retrace.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taper_tpu import models, ops
from taper_tpu.utils import aot


def test_aot_compile_runs_and_reports_cost():
    def f(x, w):
        return jnp.tanh(x @ w)

    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.full((16, 4), 0.1, jnp.float32)
    compiled, cost = aot.aot_compile(f, x, w)
    out = compiled(x, w)
    np.testing.assert_allclose(np.asarray(out), np.tanh(np.asarray(x) @
                                                        np.asarray(w)),
                               rtol=1e-6)
    assert isinstance(cost, dict)
    if "flops" in cost:                      # CPU backend reports flops
        assert cost["flops"] >= 2 * 8 * 16 * 4


def test_aot_compile_accepts_shape_structs():
    def f(x):
        return x * 2.0

    spec = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    compiled, _ = aot.aot_compile(f, spec)
    out = compiled(jnp.ones((4, 4)))
    assert float(out.sum()) == 32.0


def test_export_roundtrip_bytes():
    def f(x, y):
        return {"s": x + y, "p": x * y}

    x = jnp.arange(6.0).reshape(2, 3)
    y = jnp.ones((2, 3))
    exp = aot.export_program(f, x, y)
    blob = exp.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    g = aot.deserialize_program(bytes(blob))
    out, ref = g(x, y), f(x, y)
    np.testing.assert_allclose(np.asarray(out["s"]), np.asarray(ref["s"]))
    np.testing.assert_allclose(np.asarray(out["p"]), np.asarray(ref["p"]))


def test_save_load_file_roundtrip(tmp_path):
    def f(x):
        return jnp.cumsum(x, axis=-1)

    x = jnp.arange(12.0).reshape(3, 4)
    path = str(tmp_path / "prog.jaxexp")
    n = aot.save_program(path, f, x)
    assert n > 0 and n == len(open(path, "rb").read())
    g = aot.load_program(path)
    np.testing.assert_allclose(np.asarray(g(x)),
                               np.cumsum(np.asarray(x), axis=-1))


def test_exported_generate_token_identical(tmp_path):
    """Export TinyGPT greedy generate (params pytree + token prompt),
    reload from disk, and require token-identical output."""
    ops.set_backend("xla")
    model = models.TinyGPT(vocab_size=31, dim=32, depth=2, num_heads=4,
                           max_seq=64, rope=True)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)

    def gen(params, prompt):
        return model.generate(params, prompt, max_new=12)

    ref = np.asarray(gen(params, prompt))

    path = str(tmp_path / "generate_b1_p8.jaxexp")
    aot.save_program(path, gen, params, prompt)
    served = aot.load_program(path)
    out = np.asarray(served(params, prompt))
    np.testing.assert_array_equal(out, ref)


def test_export_platform_mismatch_rejected(tmp_path):
    """An artifact lowered only for TPU must refuse to run on CPU."""
    def f(x):
        return x + 1.0

    x = jnp.ones((2, 2))
    exp = aot.export_program(f, x, platforms=("tpu",))
    g = aot.deserialize_program(bytes(exp.serialize()))
    with pytest.raises(Exception, match="[Pp]latform|tpu"):
        jax.block_until_ready(g(x))
