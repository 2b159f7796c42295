// COCO evaluation inner loop in C++ (the reference accelerates the same loop
// with detectron2/layers/csrc/cocoeval + evaluation/fast_eval_api.py
// `_C.COCOevalEvalImages`). Exposed with C linkage and loaded via ctypes —
// no pybind11 dependency.
//
// Semantics: greedy per-threshold matching of score-sorted detections to
// ground truths (crowd GT matched by intersection-over-det-area, ignored GT
// ordered last by the caller, never switch from a real match to an ignored
// one).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// dets: (D,4) XYXY sorted by score desc; gts: (G,4) real-first.
// tp, ignore_det: (T,D) outputs (uint8).
void coco_eval_image(
    int64_t D, int64_t G, int64_t T,
    const double* dets, const double* gts,
    const uint8_t* gt_ignore, const uint8_t* iscrowd,
    const double* thresholds,
    uint8_t* tp, uint8_t* ignore_det) {
  // precompute IoU matrix (D x G)
  double* ious = new double[(size_t)D * G];
  for (int64_t d = 0; d < D; ++d) {
    const double* db = dets + d * 4;
    double area_d = (db[2] - db[0]) * (db[3] - db[1]);
    for (int64_t g = 0; g < G; ++g) {
      const double* gb = gts + g * 4;
      double ix = std::max(0.0, std::min(db[2], gb[2]) - std::max(db[0], gb[0]));
      double iy = std::max(0.0, std::min(db[3], gb[3]) - std::max(db[1], gb[1]));
      double inter = ix * iy;
      double area_g = (gb[2] - gb[0]) * (gb[3] - gb[1]);
      double uni = iscrowd[g] ? area_d : (area_d + area_g - inter);
      ious[d * G + g] = uni > 0 ? inter / uni : 0.0;
    }
  }

  bool* matched = new bool[G];
  for (int64_t ti = 0; ti < T; ++ti) {
    std::memset(matched, 0, G);
    double t = thresholds[ti];
    for (int64_t d = 0; d < D; ++d) {
      int64_t best = -1;
      double best_iou = std::min(t, 1.0 - 1e-10);
      for (int64_t g = 0; g < G; ++g) {
        if (matched[g] && !iscrowd[g]) continue;
        if (best > -1 && !gt_ignore[best] && gt_ignore[g]) break;
        if (ious[d * G + g] < best_iou) continue;
        best_iou = ious[d * G + g];
        best = g;
      }
      if (best == -1) continue;
      matched[best] = true;
      if (gt_ignore[best]) {
        ignore_det[ti * D + d] = 1;
      } else {
        tp[ti * D + d] = 1;
      }
    }
  }
  delete[] matched;
  delete[] ious;
}

}  // extern "C"
