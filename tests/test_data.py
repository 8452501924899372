"""Data pipeline tests: IDX parsing, synthetic fallback, DataLoader."""

import gzip
import struct

import numpy as np
import pytest

from taper_tpu.data import (
    DataLoader, MNISTDataset, parse_idx_images, parse_idx_labels,
    synthesize_images,
)
from taper_tpu.data.mnist import _decompress_gzip


def _fake_idx_images(n=10, rows=28, cols=28, seed=0):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, (n, rows * cols), dtype=np.uint8)
    header = struct.pack(">IIII", 0x803, n, rows, cols)
    return header + pix.tobytes(), pix


def _fake_idx_labels(n=10, seed=0):
    rng = np.random.default_rng(seed)
    labs = rng.integers(0, 10, n, dtype=np.uint8)
    return struct.pack(">II", 0x801, n) + labs.tobytes(), labs


def test_parse_idx_images_roundtrip():
    raw, pix = _fake_idx_images()
    imgs = parse_idx_images(raw)
    assert imgs.shape == (10, 784)
    np.testing.assert_allclose(imgs, pix.astype(np.float32) / 255.0)


def test_parse_idx_labels_roundtrip():
    raw, labs = _fake_idx_labels()
    out = parse_idx_labels(raw)
    np.testing.assert_array_equal(out, labs.astype(np.int32))


def test_parse_rejects_bad_magic():
    with pytest.raises(ValueError):
        parse_idx_images(struct.pack(">IIII", 0x123, 1, 28, 28) + b"\0" * 784)
    with pytest.raises(ValueError):
        parse_idx_labels(struct.pack(">II", 0x999, 1) + b"\0")


def test_parse_rejects_out_of_range_labels():
    # A corrupt mirror byte >9 would index past the 10-glyph table in the
    # synthetic renderer; the parser must reject it (ADVICE round 1).
    raw = struct.pack(">II", 0x801, 3) + bytes([1, 250, 3])
    with pytest.raises(ValueError):
        parse_idx_labels(raw)


def test_truncated_header_degrades_to_fallback(tmp_path):
    # A file shorter than the IDX header raises struct.error from the
    # parser; _load_or_fetch must catch it (ADVICE round 1) so the dataset
    # degrades to the synthetic fallback instead of aborting.
    d = tmp_path / "mnist"
    d.mkdir()
    (d / "test_labels").write_bytes(b"\x00\x08")   # 2-byte stub
    ds = MNISTDataset(train=False, data_dir=str(d), allow_download=False,
                      allow_synthetic=True)
    assert ds.source == "synthetic"
    assert len(ds) == 10000


def test_gzip_magic_recovery():
    # Reference scans for the gzip magic when mirrors prepend junk
    # (mnist.rs:166-179).
    payload = gzip.compress(b"hello idx")
    assert _decompress_gzip(b"<html>error</html>" + payload) == b"hello idx"
    with pytest.raises(ValueError):
        _decompress_gzip(b"no magic here")


def test_synthetic_images_deterministic_and_classlike():
    labels = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9] * 3, np.int32)
    a = synthesize_images(labels, seed=7)
    b = synthesize_images(labels, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (30, 784)
    assert 0.0 <= a.min() and a.max() <= 1.0
    # same digit renders correlate more than different digits
    same = np.corrcoef(a[0], a[10])[0, 1]
    diff = np.corrcoef(a[0], a[11])[0, 1]
    assert same > diff


def test_mnist_dataset_from_label_files(tmp_path):
    raw, labs = _fake_idx_labels(n=50)
    (tmp_path / "train_labels").write_bytes(raw)
    ds = MNISTDataset(train=True, data_dir=str(tmp_path),
                      allow_download=False)
    assert len(ds) == 50
    np.testing.assert_array_equal(ds.labels, labs.astype(np.int32))
    assert ds.images.shape == (50, 784)
    assert ds.source == "synthetic"  # images were rendered
    x, y = ds.get_batch([0, 3, 7])
    assert x.shape == (3, 784) and y.shape == (3,)


def test_dataloader_shapes_and_reshuffle():
    class DS:
        def __len__(self):
            return 10

        def get_batch(self, idx):
            return np.asarray(idx, np.float32)[:, None], np.asarray(idx)

    dl = DataLoader(DS(), batch_size=4, seed=0)
    assert dl.num_batches == 2  # drop_last floor
    epoch1 = [tuple(y.tolist()) for _, y in dl]
    epoch2 = [tuple(y.tolist()) for _, y in dl]
    assert len(epoch1) == 2
    assert all(len(b) == 4 for b in epoch1)
    assert epoch1 != epoch2  # reshuffled between epochs

    dl2 = DataLoader(DS(), batch_size=4, drop_last=False, shuffle=False,
                     with_count=True)
    batches = list(dl2)
    assert len(batches) == 3
    assert batches[-1][2] == 2  # true count of ragged tail
    assert batches[-1][0].shape == (4, 1)  # padded to full batch


def test_prefetch_loader_matches_base_and_lands_on_device():
    import jax
    from taper_tpu.data.loader import PrefetchLoader

    class FakeDS:
        def __len__(self):
            return 40

        def get_batch(self, idx):
            return (np.arange(80, dtype=np.float32).reshape(40, 2)[idx],
                    np.arange(40, dtype=np.int32)[idx])

    base = DataLoader(FakeDS(), batch_size=8, shuffle=True, seed=3)
    want = [(x.copy(), y.copy()) for x, y in base]
    base2 = DataLoader(FakeDS(), batch_size=8, shuffle=True, seed=3)
    got = list(PrefetchLoader(base2, prefetch=3))
    assert len(got) == len(want) == len(base2)
    for (wx, wy), (gx, gy) in zip(want, got):
        assert isinstance(gx, jax.Array)       # staged on device
        np.testing.assert_array_equal(np.asarray(gx), wx)
        np.testing.assert_array_equal(np.asarray(gy), wy)


def test_prefetch_loader_with_sharding_and_error_propagation():
    import jax
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from taper_tpu.data.loader import PrefetchLoader

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, P("data"))

    def batches():
        for i in range(3):
            yield (np.full((16, 4), i, np.float32),
                   np.full((16,), i, np.int32))

    out = list(PrefetchLoader(batches(), sharding=shard))
    assert len(out) == 3
    assert out[0][0].sharding == shard

    def bad():
        yield (np.zeros((8, 2), np.float32), np.zeros((8,), np.int32))
        raise RuntimeError("loader exploded")

    it = iter(PrefetchLoader(bad()))
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(it)


# ---------------------------------------------------------------------------
# BPE tokenizer (data/tokenizer.py)
# ---------------------------------------------------------------------------

def test_bpe_roundtrip_and_compression():
    from taper_tpu.data.tokenizer import BPETokenizer
    corpus = ("the quick brown fox jumps over the lazy dog. " * 200
              + "pack my box with five dozen liquor jugs. " * 200)
    tok = BPETokenizer.train(corpus, vocab_size=512)
    assert tok.vocab_size > 256            # merges actually learned
    text = "the quick lazy fox packs five jugs — naïve UTF-8 too ✓"
    ids = tok.encode(text)
    assert tok.decode(ids) == text         # lossless roundtrip
    assert all(0 <= i < tok.vocab_size for i in ids)
    # learned merges compress in-domain text
    assert len(tok.encode(corpus[:2000])) < 0.6 * 2000


def test_bpe_overlapping_merge_and_oov_bytes():
    from taper_tpu.data.tokenizer import BPETokenizer
    tok = BPETokenizer.train("aaaaaaaa" * 50, vocab_size=258)
    # pair (a, a): greedy left-to-right, no overlap double-count
    ids = tok.encode("aaaaa")              # aa aa a (then maybe merged)
    assert tok.decode(ids) == "aaaaa"
    # bytes never seen in training still roundtrip (byte-level base)
    assert tok.decode(tok.encode("zzz 日本語")) == "zzz 日本語"


def test_bpe_save_load_stable(tmp_path):
    from taper_tpu.data.tokenizer import BPETokenizer
    tok = BPETokenizer.train("hello hello hello world world", 300)
    p = str(tmp_path / "bpe.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    s = "hello world, hello tokens"
    assert tok.encode(s) == tok2.encode(s)
    assert tok2.decode(tok2.encode(s)) == s
