"""Native (C++) data pipeline tests: backend parity + correctness.

The C++ library is optional at runtime; these tests skip when the toolchain
can't produce it (it is built on demand by ``taper_tpu.data.native``).
"""

import numpy as np
import pytest

from taper_tpu.data import native
from taper_tpu.data.synth import synthesize_images, synthesize_images_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_render_parity_with_numpy():
    labels = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9] * 10, np.int32)
    a = synthesize_images(labels, seed=7, backend="native")
    b = synthesize_images_numpy(labels, seed=7)
    assert a.shape == b.shape == (100, 784)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_render_deterministic_and_seed_sensitive():
    labels = np.arange(20, dtype=np.int32) % 10
    a = native.render_synthetic(labels, 3)
    b = native.render_synthetic(labels, 3)
    c = native.render_synthetic(labels, 4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_parse_idx_pixels_matches_numpy():
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, 7 * 784, dtype=np.uint8)
    out = native.parse_idx_pixels(pix, 7, 784)
    np.testing.assert_allclose(
        out, pix.reshape(7, 784).astype(np.float32) / 255.0)


def test_gather_batch_matches_fancy_indexing():
    rng = np.random.default_rng(0)
    images = rng.normal(0, 1, (50, 12)).astype(np.float32)
    labels = rng.integers(0, 10, 50).astype(np.int32)
    idx = np.array([3, 1, 47, 0, 3], np.int32)
    x, y = native.gather_batch(images, labels, idx)
    np.testing.assert_array_equal(x, images[idx])
    np.testing.assert_array_equal(y, labels[idx])


def test_shuffle_indices_is_permutation():
    out = native.shuffle_indices(1000, 5)
    assert sorted(out.tolist()) == list(range(1000))
    out2 = native.shuffle_indices(1000, 5)
    np.testing.assert_array_equal(out, out2)
    assert not np.array_equal(out, native.shuffle_indices(1000, 6))


# ---------------------------------------------------------------------------
# Native BPE (native/bpe.cpp) vs the Python oracle (data/tokenizer.py)
# ---------------------------------------------------------------------------

def test_native_bpe_train_matches_python():
    from taper_tpu.data.tokenizer import BPETokenizer
    corpus = (b"the quick brown fox jumps over the lazy dog. " * 120
              + b"aaa bbb aaab abab " * 80)
    py = BPETokenizer.train(corpus, 400, use_native=False)
    nat = native.bpe_train(corpus, 400 - 256)
    assert nat is not None
    assert [tuple(m) for m in nat] == py.merges


def test_native_bpe_encode_matches_python():
    from taper_tpu.data.tokenizer import BPETokenizer
    corpus = b"hello world, hello tokens, world of hellos " * 60
    tok = BPETokenizer.train(corpus, 330, use_native=False)
    for text in (b"hello worlds of tokens",
                 b"zzz never-seen bytes \xff\x00\x80",
                 b"aaaaaaa", b""):
        py = tok.encode(text, use_native=False)
        nat = native.bpe_encode(text, np.asarray(tok.merges, np.int32))
        assert nat.tolist() == py, text
    # and the default tokenizer path (native on) roundtrips
    s = "mixed native/python path — unicode ✓"
    assert tok.decode(tok.encode(s)) == s
