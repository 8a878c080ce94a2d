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

// LSD line-segment detection — single-threaded CPU reference engine.
// Same semantics as the framework's NumPy oracle (oracle/lsd.py), which
// encodes feature_line_detector.cpp:12-228: 2x2 diagonal gradients and
// level-line angles, gradient-norm-ordered seeds, BFS region growing with a
// running circular-mean region angle, inertia rectangle fit, and the
// length / inlier-ratio filters.  Serves as the honest single-thread CPU
// baseline for the TPU LSD bench row.
// out_lines: [max_out * 4] floats (x1, y1, x2, y2); returns segment count.
int fd_lsd_detect(const uint8_t* img, int rows, int cols, float min_grad_norm,
                  float tol_rad, float min_length, float min_inlier_ratio,
                  float* out_lines, int max_out) {
  const int g_rows = rows - 1, g_cols = cols - 1;
  const size_t g = static_cast<size_t>(g_rows) * g_cols;
  std::vector<float> norm(g, 0.0f), angle(g, 0.0f);
  std::vector<uint8_t> valid(g, 0), used(g, 0);

  for (int r = 1; r < rows - 2; ++r) {
    for (int c = 1; c < cols - 2; ++c) {
      const int ad = img[(r + 1) * cols + c + 1] - img[r * cols + c];
      const int bc = img[r * cols + c + 1] - img[(r + 1) * cols + c];
      const float gx = (ad + bc) * 0.5f;
      const float gy = (ad - bc) * 0.5f;
      const float n = std::sqrt(gx * gx + gy * gy);
      const size_t k = static_cast<size_t>(r) * g_cols + c;
      norm[k] = n;
      if (n > min_grad_norm) {
        valid[k] = 1;
        angle[k] = std::atan2(gx, -gy);
      }
    }
  }

  auto wrap = [](float d) {
    while (d > static_cast<float>(M_PI)) d -= 2.0f * static_cast<float>(M_PI);
    while (d < -static_cast<float>(M_PI)) d += 2.0f * static_cast<float>(M_PI);
    return d;
  };

  // NFA-style minimum region size (feature_line_detector.cpp:17-20).
  const float p = tol_rad / static_cast<float>(M_PI);
  const float log_nt =
      5.0f * (std::log10(static_cast<float>(cols)) +
              std::log10(static_cast<float>(rows))) / 2.0f +
      std::log10(11.0f);
  const int min_size = static_cast<int>(-log_nt / std::log10(p));

  // Seeds sorted by gradient norm desc (stable — row-major tie-break).
  std::vector<int32_t> seeds;
  seeds.reserve(g / 8);
  for (size_t k = 0; k < g; ++k)
    if (valid[k]) seeds.push_back(static_cast<int32_t>(k));
  std::stable_sort(seeds.begin(), seeds.end(), [&](int32_t a, int32_t b) {
    return norm[a] > norm[b];
  });

  std::vector<int32_t> occupied_stamp(g, -1);
  std::vector<int32_t> queue, members;
  queue.reserve(4096);
  members.reserve(4096);

  int n_lines = 0;
  for (size_t si = 0; si < seeds.size() && n_lines < max_out; ++si) {
    const int32_t seed = seeds[si];
    if (used[seed]) continue;
    const int region_id = static_cast<int>(si);
    const int sr = seed / g_cols, sc = seed % g_cols;
    occupied_stamp[seed] = region_id;
    float region_angle = angle[seed];
    float sum_dx = std::cos(region_angle), sum_dy = std::sin(region_angle);
    members.clear();
    queue.clear();
    size_t head = 0;
    auto try_add = [&](int r, int c) {
      if (r < 0 || r >= g_rows || c < 0 || c >= g_cols) return;
      const size_t k = static_cast<size_t>(r) * g_cols + c;
      if (occupied_stamp[k] != region_id && !used[k] && valid[k]) {
        occupied_stamp[k] = region_id;
        queue.push_back(static_cast<int32_t>(k));
      }
    };
    for (int dr = -1; dr <= 1; ++dr)
      for (int dc = -1; dc <= 1; ++dc)
        if (dr || dc) try_add(sr + dr, sc + dc);
    while (head < queue.size()) {
      const int32_t k = queue[head++];
      if (std::fabs(wrap(region_angle - angle[k])) > tol_rad) continue;
      sum_dx += std::cos(angle[k]);
      sum_dy += std::sin(angle[k]);
      region_angle = std::atan2(sum_dy, sum_dx);
      members.push_back(k);
      used[k] = 1;
      const int r = k / g_cols, c = k % g_cols;
      for (int dr = -1; dr <= 1; ++dr)
        for (int dc = -1; dc <= 1; ++dc)
          if (dr || dc) try_add(r + dr, c + dc);
    }
    if (static_cast<int>(members.size()) < min_size) {
      for (int32_t k : members) used[k] = 0;
      continue;
    }
    // Inertia rectangle fit (feature_line_detector.cpp:163-228).
    float sum_w = 0.0f, cx = 0.0f, cy = 0.0f;
    for (int32_t k : members) {
      const float w = norm[k];
      sum_w += w;
      cx += w * (k % g_cols);
      cy += w * (k / g_cols);
    }
    if (sum_w == 0.0f) continue;
    cx /= sum_w;
    cy /= sum_w;
    float ixx = 0.0f, iyy = 0.0f, ixy = 0.0f;
    for (int32_t k : members) {
      const float w = norm[k];
      const float dx = (k % g_cols) - cx, dy = (k / g_cols) - cy;
      ixx += dy * dy * w;
      iyy += dx * dx * w;
      ixy -= dx * dy * w;
    }
    if (ixx == 0.0f || iyy == 0.0f || ixy == 0.0f) continue;  // quirk Q6
    const float smallest =
        0.5f * (ixx + iyy - std::sqrt((ixx - iyy) * (ixx - iyy) + 4.0f * ixy * ixy));
    float rect_angle = (std::fabs(ixx) > std::fabs(iyy))
                           ? std::atan2(smallest - ixx, ixy)
                           : std::atan2(ixy, smallest - iyy);
    if (std::fabs(wrap(rect_angle - region_angle)) > tol_rad) {
      rect_angle += static_cast<float>(M_PI);
      if (rect_angle >= static_cast<float>(M_PI))
        rect_angle -= 2.0f * static_cast<float>(M_PI);
    }
    const float dvx = std::cos(rect_angle), dvy = std::sin(rect_angle);
    float lmin = 0.0f, lmax = 0.0f, wmin = 0.0f, wmax = 0.0f;
    for (int32_t k : members) {
      const float dx = (k % g_cols) - cx, dy = (k / g_cols) - cy;
      const float pl = dx * dvx + dy * dvy;
      const float pw = -dx * dvy + dy * dvx;
      lmin = std::min(lmin, pl);
      lmax = std::max(lmax, pl);
      wmin = std::min(wmin, pw);
      wmax = std::max(wmax, pw);
    }
    const float length = std::max(lmax - lmin, 1.0f);
    const float width = std::max(wmax - wmin, 1.0f);
    const float area = (lmax - lmin) * width;
    const float inlier_ratio =
        area > 0.0f ? static_cast<float>(members.size()) / area : 0.0f;
    if (length < min_length || inlier_ratio < min_inlier_ratio) continue;
    out_lines[4 * n_lines] = cx + lmin * dvx + 0.5f;
    out_lines[4 * n_lines + 1] = cy + lmin * dvy + 0.5f;
    out_lines[4 * n_lines + 2] = cx + lmax * dvx + 0.5f;
    out_lines[4 * n_lines + 3] = cy + lmax * dvy + 0.5f;
    ++n_lines;
  }
  return n_lines;
}

}  // extern "C"
