// Native evaluation kernels (C++, ctypes ABI).
//
// The COCO/VOC evaluators (engine/eval.py) run a greedy per-image
// detection<->gt matching for every (image, class, IoU-threshold) triple;
// at COCO scale that is ~4M calls of an O(D*G) loop — the host-side hot
// path of evaluation. This translation unit implements it in C++; the
// Python side falls back to the numpy/python implementation when the
// shared library is unavailable.
//
// ABI: plain C, double/uint8 buffers, row-major [N,4] xyxy boxes with the
// framework's inclusive +1 pixel area convention.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double box_area(const double* b, double offset) {
  return (b[2] - b[0] + offset) * (b[3] - b[1] + offset);
}

inline double pair_iou(const double* a, const double* b, double offset) {
  const double x1 = a[0] > b[0] ? a[0] : b[0];
  const double y1 = a[1] > b[1] ? a[1] : b[1];
  const double x2 = a[2] < b[2] ? a[2] : b[2];
  const double y2 = a[3] < b[3] ? a[3] : b[3];
  const double w = x2 - x1 + offset;
  const double h = y2 - y1 + offset;
  if (w <= 0 || h <= 0) return 0.0;
  const double inter = w * h;
  const double uni = box_area(a, offset) + box_area(b, offset) - inter;
  return uni > 1e-9 ? inter / uni : 0.0;
}

}  // namespace

extern "C" {

// Greedy matching of score-sorted detections to ground truths.
//   det:    [D,4] detections, sorted by descending score
//   gt:     [G,4] ground-truth boxes
//   gt_ignore: [G] uint8, 1 = ignored gt (crowd / outside area range)
//   regions:[R,4] crowd/ignore regions (absorb otherwise-unmatched dets)
// outputs:
//   matched:     [D] uint8, 1 = true positive
//   det_ignored: [D] uint8, 1 = matched an ignored gt / region (not scored)
void td_match_image(const double* det, int64_t D,
                    const double* gt, int64_t G,
                    const uint8_t* gt_ignore,
                    const double* regions, int64_t R,
                    double iou_thr, double offset,
                    uint8_t* matched, uint8_t* det_ignored) {
  std::vector<uint8_t> gt_taken(static_cast<size_t>(G), 0);
  std::memset(matched, 0, static_cast<size_t>(D));
  std::memset(det_ignored, 0, static_cast<size_t>(D));

  for (int64_t i = 0; i < D; ++i) {
    const double* d = det + i * 4;
    int64_t best_j = -1;
    double best_iou = iou_thr;
    int64_t best_ignored_j = -1;
    double best_ignored_iou = iou_thr;
    for (int64_t j = 0; j < G; ++j) {
      if (gt_taken[static_cast<size_t>(j)]) continue;
      const double iou = pair_iou(d, gt + j * 4, offset);
      if (iou < iou_thr) continue;
      if (gt_ignore[j]) {
        if (iou > best_ignored_iou) {
          best_ignored_iou = iou;
          best_ignored_j = j;
        }
      } else if (iou > best_iou || best_j < 0) {
        best_iou = iou;
        best_j = j;
      }
    }
    if (best_j >= 0) {
      matched[i] = 1;
      gt_taken[static_cast<size_t>(best_j)] = 1;
    } else if (best_ignored_j >= 0) {
      det_ignored[i] = 1;
      gt_taken[static_cast<size_t>(best_ignored_j)] = 1;
    } else if (R > 0) {
      for (int64_t r = 0; r < R; ++r) {
        if (pair_iou(d, regions + r * 4, offset) >= iou_thr) {
          det_ignored[i] = 1;
          break;
        }
      }
    }
  }
}

// Exact COCO evaluateImg matching for all T thresholds at once.
//   iou:      [D,G] precomputed IoU, gt columns sorted non-ignored first
//             (crowd columns already normalized by detection area)
//   gt_ig:    [G] uint8, 1 = ignored gt (crowd or outside area range)
//   gt_crowd: [G] uint8, 1 = crowd gt (matchable by many detections)
//   thrs:     [T] IoU thresholds
// outputs (row-major [T,D] uint8):
//   matched: det matched ANY gt (including ignored ones)
//   ignored: the matched gt was ignored
void td_coco_match(const double* iou, int64_t D, int64_t G,
                   const uint8_t* gt_ig, const uint8_t* gt_crowd,
                   const double* thrs, int64_t T,
                   uint8_t* matched, uint8_t* ignored) {
  std::memset(matched, 0, static_cast<size_t>(T * D));
  std::memset(ignored, 0, static_cast<size_t>(T * D));
  std::vector<int64_t> gtm(static_cast<size_t>(G));
  for (int64_t t = 0; t < T; ++t) {
    double thr = thrs[t] < 1.0 - 1e-10 ? thrs[t] : 1.0 - 1e-10;
    std::fill(gtm.begin(), gtm.end(), int64_t{-1});
    for (int64_t d = 0; d < D; ++d) {
      double best = thr;
      int64_t m = -1;
      const double* row = iou + d * G;
      for (int64_t g = 0; g < G; ++g) {
        if (gtm[static_cast<size_t>(g)] >= 0 && !gt_crowd[g]) continue;
        if (m > -1 && !gt_ig[m] && gt_ig[g]) break;  // sorted: only worse left
        if (row[g] < best) continue;
        best = row[g];
        m = g;
      }
      if (m == -1) continue;
      matched[t * D + d] = 1;
      ignored[t * D + d] = gt_ig[m];
      gtm[static_cast<size_t>(m)] = d;
    }
  }
}

// Pairwise IoU matrix: out[i, j] = IoU(a[i], b[j]); used by host-side tools.
void td_iou_matrix(const double* a, int64_t N,
                   const double* b, int64_t M,
                   double offset, double* out) {
  for (int64_t i = 0; i < N; ++i) {
    for (int64_t j = 0; j < M; ++j) {
      out[i * M + j] = pair_iou(a + i * 4, b + j * 4, offset);
    }
  }
}

}  // extern "C"
