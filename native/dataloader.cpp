// Native data pipeline for taper_tpu.
//
// C++ replacement for the host-side hot paths of the reference's Rust data
// layer (reference src/data/mnist.rs): IDX parsing with /255 normalization
// (mnist.rs:184-273), the rayon-parallel batch gather (mnist.rs:276-309),
// and — beyond the reference — the synthetic digit renderer used in
// air-gapped environments (60k renders take ~2 min in NumPy, ~1 s here).
//
// The synthetic renderer is ALGORITHMICALLY IDENTICAL to the NumPy
// implementation in taper_tpu/data/synth.py: both draw from the same
// xorshift64* stream in the same order, so images agree across the two
// backends to float rounding (<= 1e-6).
//
// Build: make -C native    (produces libtaperdata.so; loaded via ctypes)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// xorshift64* PRNG — one independent stream per sample.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ^ 0x9E3779B97F4A7C15ULL) {
    if (s == 0) s = 0x9E3779B97F4A7C15ULL;
    next();  // warm up
  }
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  // uniform double in [0, 1)
  double uni() { return static_cast<double>(next() >> 11) * 0x1.0p-53; }
};

// 5x7 digit glyphs (classic bitmap font), row-major bits.
const char* kGlyphs[10][7] = {
    {"01110", "10001", "10011", "10101", "11001", "10001", "01110"},
    {"00100", "01100", "00100", "00100", "00100", "00100", "01110"},
    {"01110", "10001", "00001", "00010", "00100", "01000", "11111"},
    {"11111", "00010", "00100", "00010", "00001", "10001", "01110"},
    {"00010", "00110", "01010", "10010", "11111", "00010", "00010"},
    {"11111", "10000", "11110", "00001", "00001", "10001", "01110"},
    {"00110", "01000", "10000", "11110", "10001", "10001", "01110"},
    {"11111", "00001", "00010", "00100", "01000", "01000", "01000"},
    {"01110", "10001", "10001", "01110", "10001", "10001", "01110"},
    {"01110", "10001", "10001", "01111", "00001", "00010", "01100"},
};

constexpr float kNoiseAmp = 0.30f;

void render_one(int label, uint64_t seed, float* out /* 784 */) {
  // Labels come from downloaded IDX files unvalidated; clamp so a corrupt
  // byte can't index past kGlyphs (the NumPy fallback raises instead).
  label = std::min(9, std::max(0, label));
  Rng rng(seed);
  // v2 draw order (must match synth.py): scale, y0, x0, intensity, shear,
  // 2x(orient, pos, start, length, value) strokes, noise[784].
  int scale = 2 + static_cast<int>(rng.next() & 1);
  int gh = 7 * scale, gw = 5 * scale;
  int max_y = 28 - gh;
  int y0 = static_cast<int>(rng.uni() * (max_y + 1));
  // 2px of shear headroom on each side
  int x0 = 2 + static_cast<int>(rng.uni() * (28 - gw - 4 + 1));
  float intensity = static_cast<float>(0.55 + 0.45 * rng.uni());
  double shear = rng.uni() * 4.0 - 2.0;  // total x drift over the glyph

  float canvas[28][28] = {};
  const char** glyph = kGlyphs[label];
  for (int r = 0; r < gh; ++r) {
    int off = static_cast<int>(
        std::floor(shear * r / (gh - 1) + 0.5));
    for (int c = 0; c < gw; ++c) {
      int xx = std::min(27, std::max(0, x0 + off + c));
      canvas[y0 + r][xx] = glyph[r / scale][c / scale] == '1' ? 1.0f : 0.0f;
    }
  }

  // distractor strokes (max-composited clutter)
  for (int st = 0; st < 2; ++st) {
    int orient = static_cast<int>(rng.next() & 1);
    int pos = static_cast<int>(rng.uni() * 28);
    int start = static_cast<int>(rng.uni() * 20);
    int length = 4 + static_cast<int>(rng.uni() * 9);
    float val = static_cast<float>(0.3 + 0.4 * rng.uni());
    int stop = std::min(28, start + length);
    if (orient == 0) {
      for (int c = start; c < stop; ++c)
        canvas[pos][c] = std::max(canvas[pos][c], val);
    } else {
      for (int r = start; r < stop; ++r)
        canvas[r][pos] = std::max(canvas[r][pos], val);
    }
  }

  // separable 1-2-1 blur (zero-padded borders), vertical then horizontal
  float tmp[28][28];
  for (int r = 0; r < 28; ++r)
    for (int c = 0; c < 28; ++c) {
      float up = r > 0 ? canvas[r - 1][c] : 0.0f;
      float dn = r < 27 ? canvas[r + 1][c] : 0.0f;
      tmp[r][c] = 0.25f * up + 0.5f * canvas[r][c] + 0.25f * dn;
    }
  for (int r = 0; r < 28; ++r)
    for (int c = 0; c < 28; ++c) {
      float lf = c > 0 ? tmp[r][c - 1] : 0.0f;
      float rt = c < 27 ? tmp[r][c + 1] : 0.0f;
      canvas[r][c] = 0.25f * lf + 0.5f * tmp[r][c] + 0.25f * rt;
    }

  for (int i = 0; i < 784; ++i) {
    float noise = static_cast<float>((rng.uni() - 0.5) * kNoiseAmp);
    float v = canvas[i / 28][i % 28] * intensity + noise;
    out[i] = std::min(1.0f, std::max(0.0f, v));
  }
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t workers = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (workers == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    int64_t lo = w * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Render n synthetic digits: labels[n] -> out[n*784], deterministic in seed.
void taper_render_synthetic(const int32_t* labels, int64_t n, uint64_t seed,
                            float* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      render_one(labels[i], seed * 1000003ULL + static_cast<uint64_t>(i),
                 out + i * 784);
  });
}

// Parse IDX image payload (after the 16-byte header) into [n, rows*cols]
// f32 normalized to [0, 1].  Threaded over rows.
void taper_parse_idx_images(const uint8_t* pixels, int64_t n, int64_t dim,
                            float* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    constexpr float kInv = 1.0f / 255.0f;
    for (int64_t i = lo * dim; i < hi * dim; ++i)
      out[i] = static_cast<float>(pixels[i]) * kInv;
  });
}

// Gather rows by index: images[n_total, dim] + idx[bs] -> out_x[bs, dim],
// labels -> out_y.  The reference does this with rayon (mnist.rs:290-302).
void taper_gather_batch(const float* images, const int32_t* labels,
                        int64_t dim, const int32_t* idx, int64_t bs,
                        float* out_x, int32_t* out_y) {
  parallel_for(bs, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out_x + i * dim, images + static_cast<int64_t>(idx[i]) * dim,
                  sizeof(float) * dim);
      out_y[i] = labels[idx[i]];
    }
  });
}

// Fisher-Yates shuffle of [0, n) with the shared xorshift64* stream.
void taper_shuffle_indices(int64_t n, uint64_t seed, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = static_cast<int32_t>(i);
  Rng rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = static_cast<int64_t>(rng.uni() * (i + 1));
    std::swap(out[i], out[j]);
  }
}

}  // extern "C"
