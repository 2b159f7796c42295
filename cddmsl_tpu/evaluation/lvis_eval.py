"""LVIS evaluator (reference detectron2/evaluation/lvis_evaluation.py:360
LVISEvaluator). LVIS AP differs from COCO in three ways implemented here:
  * up to 300 detections/image, NO per-class score threshold
  * per-image category exhaustiveness: a detection of category c on an image
    where c is in `not_exhaustive_category_ids` (or not in the evaluated
    image's positive+negative sets) is IGNORED rather than a false positive
  * AP is additionally reported for the rare (<=10 training images), common
    (11-100) and frequent (>100) category buckets (APr / APc / APf)
The greedy matching and 101-point AP machinery is shared with coco_eval.
(The `lvis` pip package is unavailable in this environment, so the metric is
computed natively.)"""

from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

from .coco_eval import AREA_RANGES, IOU_THRESHOLDS, RECALL_POINTS, _eval_image


class LVISEvaluator:
    # inference_on_dataset forwards per-image neg/not-exhaustive ids only to
    # evaluators that declare support
    accepts_lvis_ignore = True

    def __init__(
        self,
        dataset_name: str = "",
        num_classes: int = 0,
        class_image_counts: Optional[Sequence[int]] = None,
    ):
        if dataset_name:
            from ..data.catalog import MetadataCatalog

            meta = MetadataCatalog.get(dataset_name)
            classes = meta.get("thing_classes")
            num_classes = num_classes or (len(classes) if classes else 0)
            class_image_counts = class_image_counts or meta.get("class_image_counts")
        assert num_classes > 0
        self.num_classes = num_classes
        self.class_image_counts = class_image_counts
        self.reset()

    def reset(self):
        self._dets = defaultdict(lambda: defaultdict(list))  # cls -> img -> [(score, box)]
        self._gts = defaultdict(lambda: defaultdict(list))  # cls -> img -> [box]
        # img -> set of category ids annotated exhaustively-negative
        self._neg = {}
        self._not_exhaustive = {}
        self._images = set()

    def process(self, image_id, boxes, scores, classes):
        self._images.add(image_id)
        for b, s, c in zip(boxes, scores, classes):
            self._dets[int(c)][image_id].append((float(s), np.asarray(b, np.float64)))

    def process_gt(self, image_id, boxes, classes, iscrowd=None,
                   neg_category_ids=(), not_exhaustive_category_ids=()):
        """`iscrowd` accepted for COCO-loop call compatibility and ignored —
        LVIS has no crowd annotations."""
        del iscrowd
        self._images.add(image_id)
        self._neg[image_id] = set(int(c) for c in neg_category_ids)
        self._not_exhaustive[image_id] = set(int(c) for c in not_exhaustive_category_ids)
        for b, c in zip(boxes, classes):
            self._gts[int(c)][image_id].append(np.asarray(b, np.float64))

    def _class_pr(self, c: int, area_lo: float, area_hi: float):
        T = len(IOU_THRESHOLDS)
        all_scores, all_tp, all_ign = [], [], []
        npos = 0
        for img in self._images:
            gts = np.array(self._gts.get(c, {}).get(img, [])).reshape(-1, 4)
            # LVIS rule: an image evaluates category c only if c is in its
            # positive set or its negative set; otherwise dets are ignored
            neg = self._neg.get(img, set())
            not_exh = self._not_exhaustive.get(img, set())
            evaluated = (len(gts) > 0) or (c in neg)
            areas = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]) if len(gts) else np.zeros(0)
            gt_ignore = (areas < area_lo) | (areas > area_hi)
            npos += int((~gt_ignore).sum())
            det_list = self._dets.get(c, {}).get(img, [])
            if not det_list:
                continue
            det_boxes = np.array([b for _, b in det_list]).reshape(-1, 4)
            det_scores = np.array([s for s, _ in det_list])
            iscrowd = np.zeros(len(gts), bool)
            scores, tp, ign = _eval_image(det_boxes, det_scores, gts, gt_ignore, iscrowd, IOU_THRESHOLDS)
            if (not evaluated) or (c in not_exh):
                # unmatched dets don't count as FP on non-exhaustive images
                ign = ign | ~tp
            d_areas = (det_boxes[:, 2] - det_boxes[:, 0]) * (det_boxes[:, 3] - det_boxes[:, 1])
            order = np.argsort(-det_scores, kind="stable")
            oor = ((d_areas < area_lo) | (d_areas > area_hi))[order]
            ign = ign | (oor[None, :] & ~tp)
            all_scores.append(scores)
            all_tp.append(tp)
            all_ign.append(ign)
        if npos == 0:
            return None
        if not all_scores:
            return np.zeros((T, len(RECALL_POINTS)))
        scores = np.concatenate(all_scores)
        tp = np.concatenate(all_tp, axis=1)
        ign = np.concatenate(all_ign, axis=1)
        order = np.argsort(-scores, kind="mergesort")
        tp, ign = tp[:, order], ign[:, order]
        out = np.zeros((T, len(RECALL_POINTS)))
        for t in range(T):
            keep = ~ign[t]
            tps = np.cumsum(tp[t][keep])
            fps = np.cumsum(~tp[t][keep])
            rec = tps / npos
            prec = tps / np.maximum(tps + fps, 1e-10)
            for i in range(len(prec) - 1, 0, -1):
                prec[i - 1] = max(prec[i - 1], prec[i])
            idx = np.searchsorted(rec, RECALL_POINTS, side="left")
            out[t] = (
                np.where(idx < len(prec), prec[np.minimum(idx, max(len(prec) - 1, 0))], 0.0)
                if len(prec)
                else 0.0
            )
        return out

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        lo, hi = AREA_RANGES["all"]
        ap_all, ap50, ap75 = [], [], []
        bucket = {"r": [], "c": [], "f": []}
        for c in range(self.num_classes):
            if not any(len(v) for v in self._gts.get(c, {}).values()):
                continue
            pr = self._class_pr(c, lo, hi)
            if pr is None:
                continue
            ap = float(np.mean(pr))
            ap_all.append(ap)
            ap50.append(float(np.mean(pr[0])))
            ap75.append(float(np.mean(pr[5])))
            if self.class_image_counts is not None and c < len(self.class_image_counts):
                n = self.class_image_counts[c]
                key = "r" if n <= 10 else ("c" if n <= 100 else "f")
                bucket[key].append(ap)
        res = {
            "AP": 100 * float(np.mean(ap_all)) if ap_all else float("nan"),
            "AP50": 100 * float(np.mean(ap50)) if ap50 else float("nan"),
            "AP75": 100 * float(np.mean(ap75)) if ap75 else float("nan"),
            "APr": 100 * float(np.mean(bucket["r"])) if bucket["r"] else float("nan"),
            "APc": 100 * float(np.mean(bucket["c"])) if bucket["c"] else float("nan"),
            "APf": 100 * float(np.mean(bucket["f"])) if bucket["f"] else float("nan"),
        }
        return {"bbox": res}
