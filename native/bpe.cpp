// Native BPE trainer/encoder for taper_tpu (data/tokenizer.py fast path).
//
// Byte-level BPE is host-side data-pipeline work (it runs on CPU while
// the TPU trains), and the merge loop is the hot part: each of the
// n_merges rounds scans the whole corpus.  This is the same role the
// reference gives rayon/native code on its host paths (reference
// src/data/mnist.rs) — the Python implementation in
// taper_tpu/data/tokenizer.py stays as the algorithmic oracle and the
// two are EXACTLY equivalent:
//
// * pair counting: most-frequent adjacent pair, ties broken toward the
//   smaller packed (left<<32 | right) key — matching NumPy's
//   unique()+argmax (unique returns sorted keys; argmax takes the
//   first maximum).
// * merging: greedy left-to-right, overlapping matches dropped
//   (matching _merge's "i > prev + 1" rule).
//
// Build: make -C native (links into libtaperdata.so; loaded via ctypes)

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

// One greedy left-to-right merge pass of `pair` -> new_id over ids.
// Returns the new length (in place).
int64_t merge_pass(std::vector<int32_t>& ids, int32_t a, int32_t b,
                   int32_t new_id) {
  const int64_t n = static_cast<int64_t>(ids.size());
  int64_t w = 0;
  for (int64_t r = 0; r < n; ++r) {
    if (r + 1 < n && ids[r] == a && ids[r + 1] == b) {
      ids[w++] = new_id;
      ++r;  // consume the right element; disallows overlap
    } else {
      ids[w++] = ids[r];
    }
  }
  ids.resize(w);
  return w;
}

}  // namespace

extern "C" {

// Learn up to n_merges merges from corpus[0..n); writes (left, right)
// pairs into merges_out[2*k], merges_out[2*k+1].  Returns the number of
// merges actually learned (stops early when no pair repeats).
int64_t taper_bpe_train(const uint8_t* corpus, int64_t n,
                        int32_t n_merges, int32_t* merges_out) {
  std::vector<int32_t> ids(corpus, corpus + n);
  std::unordered_map<uint64_t, int64_t> counts;
  for (int32_t k = 0; k < n_merges; ++k) {
    if (ids.size() < 2) return k;
    counts.clear();
    counts.reserve(ids.size());
    for (std::size_t i = 0; i + 1 < ids.size(); ++i) {
      const uint64_t key = (static_cast<uint64_t>(ids[i]) << 32) |
                           static_cast<uint32_t>(ids[i + 1]);
      ++counts[key];
    }
    uint64_t best_key = 0;
    int64_t best_count = 0;
    for (const auto& kv : counts) {
      // ties toward the smaller key == NumPy unique()+argmax order
      if (kv.second > best_count ||
          (kv.second == best_count && kv.first < best_key)) {
        best_count = kv.second;
        best_key = kv.first;
      }
    }
    if (best_count < 2) return k;
    const int32_t a = static_cast<int32_t>(best_key >> 32);
    const int32_t b = static_cast<int32_t>(best_key & 0xFFFFFFFFu);
    merges_out[2 * k] = a;
    merges_out[2 * k + 1] = b;
    merge_pass(ids, a, b, 256 + k);
  }
  return n_merges;
}

// Encode text[0..n) with `merges` ((left, right) pairs in rank order).
// out must hold n int32s; returns the encoded length.
int64_t taper_bpe_encode(const uint8_t* text, int64_t n,
                         const int32_t* merges, int32_t n_merges,
                         int32_t* out) {
  std::vector<int32_t> ids(text, text + n);
  for (int32_t r = 0; r < n_merges && ids.size() >= 2; ++r) {
    merge_pass(ids, merges[2 * r], merges[2 * r + 1], 256 + r);
  }
  for (std::size_t i = 0; i < ids.size(); ++i) out[i] = ids[i];
  return static_cast<int64_t>(ids.size());
}

}  // extern "C"
