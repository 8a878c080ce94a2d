// Native host-side engine for feature_detector_tpu.
//
// The TPU (JAX/Pallas) path is the production compute path; this C++ library
// is the latency-critical host fallback and CPU reference engine, covering the
// same capability surface as the reference's native code (SURVEY.md §2
// native-code checklist): FAST response + greedy mask-suppression selection
// (feature_point_fast_detector.cpp:11-98, feature_point_detector.cpp:54-98),
// steered BRIEF with bilinear sampling (descriptor_brief.cpp:8-50), and the
// XOR-popcount Hamming matcher (new capability, BASELINE.json configs[1]).
// Semantics match the framework's NumPy oracle bit-for-bit (same tie-break
// divergences Q2/Q10 as the JAX kernels).
//
// Build: make -C native   (produces libfd_host.so; loaded via ctypes from
// feature_detector_tpu/io/native.py)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kFastCircle[16][2] = {
    {0, -3}, {1, -3}, {2, -2}, {3, -1}, {3, 0},  {3, 1},   {2, 2},   {1, 3},
    {0, 3},  {-1, 3}, {-2, 2}, {-3, 1}, {-3, 0}, {-3, -1}, {-2, -2}, {-1, -3}};

inline int fast_response(const uint8_t* img, int rows, int cols, int r, int c,
                         int diff) {
  const int v = img[r * cols + c];
  const int hi = v + diff;
  const int lo = v - diff;

  // Pre-check with final-count semantics (compass 4, 8, 12 share a sign).
  int cls4[4];
  const int compass[4] = {0, 4, 8, 12};
  for (int i = 0; i < 4; ++i) {
    const int* o = kFastCircle[compass[i]];
    const int p = img[(r + o[1]) * cols + (c + o[0])];
    cls4[i] = p > hi ? 1 : (p < lo ? -1 : 0);
  }
  const bool pre = (cls4[1] == 1 && cls4[2] == 1 && cls4[3] == 1) ||
                   (cls4[1] == -1 && cls4[2] == -1 && cls4[3] == -1);
  if (!pre) return 0;

  int cls[16];
  for (int i = 0; i < 16; ++i) {
    const int* o = kFastCircle[i];
    const int p = img[(r + o[1]) * cols + (c + o[0])];
    cls[i] = p > hi ? 1 : (p < lo ? -1 : 0);
  }
  int best = 0;
  for (int sign = -1; sign <= 1; sign += 2) {
    int run = 0, m = 0;
    for (int k = 0; k < 32; ++k) {
      if (cls[k % 16] == sign) {
        if (++run > m) m = run;
      } else {
        run = 0;
      }
    }
    best = std::max(best, std::min(m, 16));
  }
  return best;
}

inline float bilinear(const uint8_t* img, int rows, int cols, float y,
                      float x) {
  int y0 = static_cast<int>(std::floor(y));
  int x0 = static_cast<int>(std::floor(x));
  y0 = std::min(std::max(y0, 0), rows - 2);
  x0 = std::min(std::max(x0, 0), cols - 2);
  const float wy = y - y0;
  const float wx = x - x0;
  const float v00 = img[y0 * cols + x0];
  const float v01 = img[y0 * cols + x0 + 1];
  const float v10 = img[(y0 + 1) * cols + x0];
  const float v11 = img[(y0 + 1) * cols + x0 + 1];
  return v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
         v10 * wy * (1 - wx) + v11 * wy * wx;
}

}  // namespace

extern "C" {

// FAST detect + greedy square-suppression selection.
// existing_uv: [n_existing * 2] (x, y) floats seeding the suppression mask.
// out_uv: [max_out * 2]; returns number of NEW features written.
int fd_fast_detect(const uint8_t* img, int rows, int cols, int n_threshold,
                   int diff, float min_response, int min_distance,
                   const float* existing_uv, int n_existing, int needed_total,
                   float* out_uv, float* out_resp, int max_out) {
  std::vector<uint8_t> mask(static_cast<size_t>(rows) * cols, 1);
  auto draw = [&](int rr, int cc) {
    const int r0 = std::max(0, rr - min_distance);
    const int r1 = std::min(rows - 1, rr + min_distance);
    const int c0 = std::max(0, cc - min_distance);
    const int c1 = std::min(cols - 1, cc + min_distance);
    for (int r = r0; r <= r1; ++r)
      std::memset(&mask[r * cols + c0], 0, c1 - c0 + 1);
  };
  for (int i = 0; i < n_existing; ++i) {
    draw(static_cast<int>(existing_uv[2 * i + 1]),
         static_cast<int>(existing_uv[2 * i]));
  }

  struct Cand {
    float resp;
    int r, c;
  };
  std::vector<Cand> cands;
  cands.reserve(4096);
  for (int r = 3; r < rows - 3; ++r) {
    for (int c = 3; c < cols - 3; ++c) {
      if (!mask[r * cols + c]) continue;
      const int resp = fast_response(img, rows, cols, r, c, diff);
      // Inclusive threshold (divergence Q2, matches the JAX kernels).
      if (resp > 0 && static_cast<float>(resp) >= min_response)
        cands.push_back({static_cast<float>(resp), r, c});
    }
  }
  // Stable desc sort = (response desc, row-major) tie-break.
  std::stable_sort(cands.begin(), cands.end(),
                   [](const Cand& a, const Cand& b) { return a.resp > b.resp; });

  int written = 0;
  int total = n_existing;
  for (const auto& cand : cands) {
    if (total >= needed_total || written >= max_out) break;
    if (!mask[cand.r * cols + cand.c]) continue;
    out_uv[2 * written] = static_cast<float>(cand.c);
    out_uv[2 * written + 1] = static_cast<float>(cand.r);
    out_resp[written] = cand.resp;
    ++written;
    ++total;
    if (total >= needed_total) break;
    draw(cand.r, cand.c);
  }
  return written;
}

// Steered BRIEF: pattern is [length * 4] int16 (dc1, dr1, dc2, dr2).
// out_words: [n * words_per_desc] uint32; out_valid: [n] uint8.
void fd_brief_compute(const uint8_t* img, int rows, int cols, const float* uv,
                      int n, const int16_t* pattern, int length,
                      int half_patch, uint32_t* out_words,
                      uint8_t* out_valid) {
  const int words = (length + 31) / 32;
  std::memset(out_words, 0, sizeof(uint32_t) * n * words);
  const float max_bound = std::max(19.0f, 2.0f * half_patch);
  for (int i = 0; i < n; ++i) {
    out_valid[i] = 0;
    const float x = uv[2 * i];
    const float y = uv[2 * i + 1];
    if (x < max_bound || x > cols - max_bound || y < max_bound ||
        y > rows - max_bound)
      continue;
    float m10 = 0.0f, m01 = 0.0f;
    for (int dx = -half_patch; dx <= half_patch; ++dx) {
      for (int dy = -half_patch; dy <= half_patch; ++dy) {
        const float v = bilinear(img, rows, cols, y + dy, x + dx);
        m10 += dx * v;
        m01 += dy * v;
      }
    }
    const float m = std::sqrt(m01 * m01 + m10 * m10);
    if (m < 1e-10f) continue;
    const float st = m01 / m;
    const float ct = m10 / m;
    uint32_t* w = &out_words[i * words];
    for (int j = 0; j < length; ++j) {
      const float p1x = ct * pattern[4 * j] - st * pattern[4 * j + 1] + x;
      const float p1y = st * pattern[4 * j] + ct * pattern[4 * j + 1] + y;
      const float p2x = ct * pattern[4 * j + 2] - st * pattern[4 * j + 3] + x;
      const float p2y = st * pattern[4 * j + 2] + ct * pattern[4 * j + 3] + y;
      const float v1 = bilinear(img, rows, cols, p1y, p1x);
      const float v2 = bilinear(img, rows, cols, p2y, p2x);
      if (v1 < v2) w[j / 32] |= (1u << (j % 32));
    }
    out_valid[i] = 1;
  }
}

// Cross-checked Hamming matcher.  out_index: [na] int32 (-1 unmatched);
// out_dist: [na] int32.
void fd_hamming_match(const uint32_t* wa, const uint8_t* va, int na,
                      const uint32_t* wb, const uint8_t* vb, int nb, int words,
                      int max_distance, int cross_check, int32_t* out_index,
                      int32_t* out_dist) {
  const int BIG = 1 << 20;
  std::vector<int32_t> best_b(nb, BIG), best_b_idx(nb, -1);
  std::vector<int32_t> best_a(na, BIG), best_a_idx(na, -1);
  for (int i = 0; i < na; ++i) {
    if (!va[i]) continue;
    for (int j = 0; j < nb; ++j) {
      if (!vb[j]) continue;
      int d = 0;
      for (int k = 0; k < words; ++k)
        d += __builtin_popcount(wa[i * words + k] ^ wb[j * words + k]);
      if (d < best_a[i]) {
        best_a[i] = d;
        best_a_idx[i] = j;
      }
      if (d < best_b[j]) {
        best_b[j] = d;
        best_b_idx[j] = i;
      }
    }
  }
  for (int i = 0; i < na; ++i) {
    const bool ok = va[i] && best_a_idx[i] >= 0 && best_a[i] <= max_distance &&
                    (!cross_check || best_b_idx[best_a_idx[i]] == i);
    out_index[i] = ok ? best_a_idx[i] : -1;
    out_dist[i] = ok ? best_a[i] : BIG;
  }
}

}  // extern "C"
