// hostops — native host-side kernels for avede_tpu.
//
// The TPU owns the model math; these C++ kernels own the host-side hot
// loops that feed it: perceptual hashing over frame stacks, Hamming
// distance matrices, box IoU, and greedy NMS for host-side post-
// processing. The reference implements these in per-frame Python/cv2
// loops (/root/reference/src/services/image_matcher.py:134-161,
// universal_detector.py:913-971); here they are vectorized C++ exposed
// through ctypes (no pybind11 in this image).
//
// Build: python -m avede_tpu.native.build   (g++ -O3 -march=native)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Perceptual hash: 8x8 average hash over grayscale images.
// images: [n, h, w] uint8 (grayscale, C-contiguous) -> hashes [n] uint64
// ---------------------------------------------------------------------------
void phash_batch(const uint8_t* images, int64_t n, int64_t h, int64_t w,
                 uint64_t* hashes) {
  const int HS = 8;
  std::vector<double> cell(HS * HS);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* img = images + i * h * w;
    // area-average downsample to 8x8
    for (int cy = 0; cy < HS; ++cy) {
      int64_t y0 = cy * h / HS, y1 = (cy + 1) * h / HS;
      if (y1 <= y0) y1 = y0 + 1;
      for (int cx = 0; cx < HS; ++cx) {
        int64_t x0 = cx * w / HS, x1 = (cx + 1) * w / HS;
        if (x1 <= x0) x1 = x0 + 1;
        double acc = 0.0;
        for (int64_t y = y0; y < y1; ++y)
          for (int64_t x = x0; x < x1; ++x) acc += img[y * w + x];
        cell[cy * HS + cx] = acc / double((y1 - y0) * (x1 - x0));
      }
    }
    double mean = 0.0;
    for (double v : cell) mean += v;
    mean /= (HS * HS);
    uint64_t bits = 0;
    for (int b = 0; b < HS * HS; ++b)
      if (cell[b] > mean) bits |= (uint64_t(1) << b);
    hashes[i] = bits;
  }
}

// Hamming distances: query vs n hashes -> out [n] int32
void hamming_batch(uint64_t query, const uint64_t* hashes, int64_t n,
                   int32_t* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = int32_t(__builtin_popcountll(query ^ hashes[i]));
}

// ---------------------------------------------------------------------------
// Pairwise IoU: a [n,4], b [m,4] xyxy float32 -> out [n*m] float32
// ---------------------------------------------------------------------------
void pairwise_iou(const float* a, int64_t n, const float* b, int64_t m,
                  float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float ax0 = a[i * 4], ay0 = a[i * 4 + 1];
    const float ax1 = a[i * 4 + 2], ay1 = a[i * 4 + 3];
    const float aarea = std::max(ax1 - ax0, 0.f) * std::max(ay1 - ay0, 0.f);
    for (int64_t j = 0; j < m; ++j) {
      const float bx0 = b[j * 4], by0 = b[j * 4 + 1];
      const float bx1 = b[j * 4 + 2], by1 = b[j * 4 + 3];
      const float iw = std::max(
          std::min(ax1, bx1) - std::max(ax0, bx0), 0.f);
      const float ih = std::max(
          std::min(ay1, by1) - std::max(ay0, by0), 0.f);
      const float inter = iw * ih;
      const float barea =
          std::max(bx1 - bx0, 0.f) * std::max(by1 - by0, 0.f);
      const float uni = aarea + barea - inter;
      out[i * m + j] = uni > 1e-9f ? inter / uni : 0.f;
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy NMS on host: boxes [n,4] xyxy, scores [n] float32.
// keep: out indices (int32, caller-allocated n), returns count kept.
// ---------------------------------------------------------------------------
int64_t nms(const float* boxes, const float* scores, int64_t n,
            float iou_threshold, int32_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t x, int64_t y) { return scores[x] > scores[y]; });
  std::vector<char> dead(n, 0);
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t i = order[oi];
    if (dead[i] || !(scores[i] > -1e30f)) continue;
    keep[kept++] = int32_t(i);
    const float ax0 = boxes[i * 4], ay0 = boxes[i * 4 + 1];
    const float ax1 = boxes[i * 4 + 2], ay1 = boxes[i * 4 + 3];
    const float aarea = std::max(ax1 - ax0, 0.f) * std::max(ay1 - ay0, 0.f);
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      int64_t j = order[oj];
      if (dead[j]) continue;
      const float bx0 = boxes[j * 4], by0 = boxes[j * 4 + 1];
      const float bx1 = boxes[j * 4 + 2], by1 = boxes[j * 4 + 3];
      const float iw = std::max(
          std::min(ax1, bx1) - std::max(ax0, bx0), 0.f);
      const float ih = std::max(
          std::min(ay1, by1) - std::max(ay0, by0), 0.f);
      const float inter = iw * ih;
      const float barea =
          std::max(bx1 - bx0, 0.f) * std::max(by1 - by0, 0.f);
      const float uni = aarea + barea - inter;
      if (uni > 1e-9f && inter / uni > iou_threshold) dead[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// Temporal dedup used by the open-vocab matcher: entries sorted by
// score desc; kill j if same query id, |t_i - t_j| <= window and
// IoU >= thr for some kept i. Returns kept count.
// ---------------------------------------------------------------------------
int64_t temporal_dedup(const float* boxes, const float* times,
                       const int32_t* query_ids, int64_t n,
                       float time_window, float iou_threshold,
                       int32_t* keep) {
  std::vector<int32_t> kept_idx;
  kept_idx.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    bool dup = false;
    const float ax0 = boxes[i * 4], ay0 = boxes[i * 4 + 1];
    const float ax1 = boxes[i * 4 + 2], ay1 = boxes[i * 4 + 3];
    const float aarea = std::max(ax1 - ax0, 0.f) * std::max(ay1 - ay0, 0.f);
    for (int32_t j : kept_idx) {
      if (query_ids[i] != query_ids[j]) continue;
      if (std::fabs(times[i] - times[j]) > time_window) continue;
      const float bx0 = boxes[j * 4], by0 = boxes[j * 4 + 1];
      const float bx1 = boxes[j * 4 + 2], by1 = boxes[j * 4 + 3];
      const float iw = std::max(
          std::min(ax1, bx1) - std::max(ax0, bx0), 0.f);
      const float ih = std::max(
          std::min(ay1, by1) - std::max(ay0, by0), 0.f);
      const float inter = iw * ih;
      const float barea =
          std::max(bx1 - bx0, 0.f) * std::max(by1 - by0, 0.f);
      const float uni = aarea + barea - inter;
      if (uni > 1e-9f && inter / uni >= iou_threshold) {
        dup = true;
        break;
      }
    }
    if (!dup) kept_idx.push_back(int32_t(i));
  }
  std::memcpy(keep, kept_idx.data(), kept_idx.size() * sizeof(int32_t));
  return int64_t(kept_idx.size());
}

}  // extern "C"
