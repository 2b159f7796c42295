"""COCO-style bbox mAP evaluation in pure numpy.

Equivalent of the reference COCOEvaluator + its C++-accelerated
fast_eval_api (detectron2/evaluation/coco_evaluation.py,
fast_eval_api.py:121 `_C.COCOevalEvalImages/Accumulate`, csrc/cocoeval/):
101-point interpolated AP averaged over IoU .50:.95, AP50/AP75, and the
small/medium/large area splits, with iscrowd-as-ignore semantics. No
pycocotools dependency.
"""

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.catalog import MetadataCatalog


def _native_lib():
    from ..csrc.build import load_native

    return load_native("cocoeval")


IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)  # pycocotools Params.setDetParams
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32 ** 2),
    "medium": (32 ** 2, 96 ** 2),
    "large": (96 ** 2, 1e10),
}
# pycocotools Params.setKpParams: keypoints AP uses all/medium/large only
KP_AREA_RANGES = {k: AREA_RANGES[k] for k in ("all", "medium", "large")}
# pycocotools COCO-person OKS sigmas (cocoeval.py Params.kpt_oks_sigmas)
COCO_PERSON_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89]
) / 10.0


def _oks_matrix(det_kps, gt_kps, gt_boxes, sigmas):
    """(D,K,3) det keypoints x (G,K,3) gt keypoints -> (D,G) OKS
    (pycocotools cocoeval.py computeOks; gt area approximated by the gt BOX
    area — this repo's GT store is box-based; rectangle-ish objects differ
    negligibly, documented in docs/PARITY.md)."""
    D, G = len(det_kps), len(gt_kps)
    if D == 0 or G == 0:
        return np.zeros((D, G))
    k = det_kps.shape[1]
    var = (sigmas[:k] * 2.0) ** 2  # (K,)
    areas = np.maximum(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-6
    )
    out = np.zeros((D, G))
    for g in range(G):
        xg, yg, vg = gt_kps[g, :, 0], gt_kps[g, :, 1], gt_kps[g, :, 2]
        lab = vg > 0
        k1 = int(lab.sum())
        x0, y0, x1, y1 = gt_boxes[g]
        bw, bh = x1 - x0, y1 - y0
        for d in range(D):
            xd, yd = det_kps[d, :, 0], det_kps[d, :, 1]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
                e = (dx ** 2 + dy ** 2) / var / (areas[g] + np.spacing(1)) / 2.0
                out[d, g] = np.mean(np.exp(-e[lab]))
            else:
                # crowd-style distance to the expanded gt box
                ex0, ex1 = x0 - bw, x1 + bw
                ey0, ey1 = y0 - bh, y1 + bh
                dx = np.maximum(0, ex0 - xd) + np.maximum(0, xd - ex1)
                dy = np.maximum(0, ey0 - yd) + np.maximum(0, yd - ey1)
                e = (dx ** 2 + dy ** 2) / var / (areas[g] + np.spacing(1)) / 2.0
                out[d, g] = np.mean(np.exp(-e))
    return out


def _iou_matrix(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(D,4),(G,4) XYXY -> (D,G); crowd GT uses intersection-over-det-area."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    area_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(iscrowd[None, :], area_d[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)


def _eval_image(dets, det_scores, gts, gt_ignore, iscrowd, thresholds, ious=None):
    """Greedy matching per COCOeval.evaluateImg. Returns per-threshold
    (det_matched_ignore, det_tp) arrays sorted by score desc, plus npos.
    Uses the C++ kernel (csrc/cocoeval.cpp) when available.

    `ious`: optional precomputed (D, G) IoU matrix in the ORIGINAL det/gt
    order (used for segm, where IoU comes from masks, not boxes)."""
    order = np.argsort(-det_scores, kind="stable")
    dets = dets[order]
    # gts ordered real-first (cocoeval sorts by ignore flag)
    g_order = np.argsort(gt_ignore.astype(np.int8), kind="stable")
    if ious is not None:
        ious = ious[order][:, g_order]
    gts, gt_ignore, iscrowd = gts[g_order], gt_ignore[g_order], iscrowd[g_order]

    native = _native_lib()
    if native is not None and ious is None and len(dets) and len(gts):
        import ctypes

        T, D, G = len(thresholds), len(dets), len(gts)
        tp = np.zeros((T, D), np.uint8)
        ign = np.zeros((T, D), np.uint8)
        c_dbl = ctypes.POINTER(ctypes.c_double)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        native.coco_eval_image(
            ctypes.c_int64(D),
            ctypes.c_int64(G),
            ctypes.c_int64(T),
            np.ascontiguousarray(dets, np.float64).ctypes.data_as(c_dbl),
            np.ascontiguousarray(gts, np.float64).ctypes.data_as(c_dbl),
            np.ascontiguousarray(gt_ignore, np.uint8).ctypes.data_as(c_u8),
            np.ascontiguousarray(iscrowd, np.uint8).ctypes.data_as(c_u8),
            np.ascontiguousarray(thresholds, np.float64).ctypes.data_as(c_dbl),
            tp.ctypes.data_as(c_u8),
            ign.ctypes.data_as(c_u8),
        )
        return det_scores[order], tp.astype(bool), ign.astype(bool)

    if ious is None:
        ious = _iou_matrix(dets, gts, iscrowd)
    T = len(thresholds)
    D, G = len(dets), len(gts)
    tp = np.zeros((T, D), bool)
    ignore_det = np.zeros((T, D), bool)
    for t_i, t in enumerate(thresholds):
        matched = np.zeros(G, bool)
        for d in range(D):
            best, best_iou = -1, min(t, 1 - 1e-10)
            for g in range(G):
                if matched[g] and not iscrowd[g]:
                    continue
                # COCO rule: once matched to a real gt, never switch to an
                # ignored one (gts are ordered real-first by the caller)
                if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best = g
            if best == -1:
                continue
            matched[best] = True
            if gt_ignore[best]:
                ignore_det[t_i, d] = True
            else:
                tp[t_i, d] = True
    return det_scores[order], tp, ignore_det


class COCOEvaluator:
    """Accumulates detections + GT; evaluate() returns the COCO metric dict
    under keys 'bbox' (and 'segm' when tasks include it — reference
    coco_evaluation.py:_tasks_from_predictions / MASK_ON)."""

    # box layout hooks, overridden by RotatedCOCOEvaluator (XYWHA, dim 5)
    box_dim = 4

    def _box_area(self, boxes: np.ndarray) -> np.ndarray:
        if len(boxes) == 0:
            return np.zeros(0)
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def _box_iou(self, dets, gts, iscrowd):
        """Return a (D, G) IoU matrix for the bbox task, or None to let
        _eval_image compute axis-aligned XYXY IoU (C++-kernel eligible)."""
        return None

    def __init__(self, dataset_name: str, tasks: Sequence[str] = ("bbox",),
                 output_json: Optional[str] = None, kpt_oks_sigmas=None):
        meta = MetadataCatalog.get(dataset_name)
        classes = meta.get("thing_classes")
        self.num_classes = len(classes) if classes else 80
        self.class_names = classes
        self.tasks = tuple(tasks)
        self.output_json = output_json
        # keypoints task: OKS sigmas — explicit arg (TEST.KEYPOINT_OKS_SIGMAS)
        # overrides metadata (reference coco_evaluation.py:108 kpt_oks_sigmas
        # param + :188-309 keypoints branch)
        if kpt_oks_sigmas is None:
            kpt_oks_sigmas = meta.get("keypoint_oks_sigmas")
        self.kpt_oks_sigmas = (
            np.asarray(kpt_oks_sigmas) if kpt_oks_sigmas is not None else COCO_PERSON_SIGMAS
        )
        self.reset()

    def reset(self):
        # cls -> img -> [(score, box, rle_or_None)]
        self._dets = defaultdict(lambda: defaultdict(list))
        # cls -> img -> [(box, iscrowd, rle_or_None)]
        self._gts = defaultdict(lambda: defaultdict(list))
        # keypoints, appended in lockstep with _dets/_gts (kp task only)
        self._det_kps = defaultdict(lambda: defaultdict(list))
        self._gt_kps = defaultdict(lambda: defaultdict(list))
        self._images = set()

    def process(self, image_id, boxes, scores, classes, masks=None, image_hw=None,
                keypoints=None):
        """`masks`: optional (N, M, M) box-space probabilities; pasted to
        `image_hw` and RLE-encoded when the segm task is on. `keypoints`:
        optional (N, K, 3) decoded (x, y, score) keypoints."""
        self._images.add(image_id)
        rles = [None] * len(boxes)
        if masks is not None and "segm" in self.tasks:
            from .masks import paste_masks_np, rle_encode

            pasted = paste_masks_np(np.asarray(masks), np.asarray(boxes), image_hw)
            rles = [rle_encode(m) for m in pasted]
        if keypoints is None:
            keypoints = [None] * len(boxes)
        for b, s, c, r, kp in zip(boxes, scores, classes, rles, keypoints):
            self._dets[int(c)][image_id].append((float(s), np.asarray(b, np.float64), r))
            if "keypoints" in self.tasks:
                self._det_kps[int(c)][image_id].append(
                    np.asarray(kp, np.float64) if kp is not None else None
                )

    def process_gt(self, image_id, boxes, classes, iscrowd=None, segmentations=None, image_hw=None,
                   keypoints=None):
        """`segmentations`: optional per-instance polygon lists (original
        image coords) rasterized at `image_hw` for the segm task.
        `keypoints`: optional (N, K, 3) (x, y, vis) GT keypoints."""
        self._images.add(image_id)
        if iscrowd is None:
            iscrowd = np.zeros(len(boxes), bool)
        rles = [None] * len(boxes)
        if segmentations is not None and "segm" in self.tasks:
            # each entry may be polygons, an RLE dict (crowds), or an array
            from .masks import segmentation_to_rle

            rles = [segmentation_to_rle(segs, image_hw) for segs in segmentations]
        if keypoints is None:
            keypoints = [None] * len(boxes)
        for b, c, cr, r, kp in zip(boxes, classes, iscrowd, rles, keypoints):
            self._gts[int(c)][image_id].append((np.asarray(b, np.float64), bool(cr), r))
            if "keypoints" in self.tasks:
                self._gt_kps[int(c)][image_id].append(
                    np.asarray(kp, np.float64) if kp is not None else None
                )

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for task in self.tasks:
            out[task] = self._evaluate_task(task)
        if self.output_json:
            self.dump_predictions(self.output_json)
        return out

    def dump_predictions(self, path: str) -> None:
        """Write the accumulated detections in the standard COCO results
        schema (reference COCOEvaluator's coco_instances_results.json) —
        consumable by tools/visualize_json_results.py."""
        import json
        import os

        records = []
        for c, per_img in self._dets.items():
            for img, dets in per_img.items():
                for score, box, rle in dets:
                    x1, y1, x2, y2 = [float(v) for v in box]
                    rec = {
                        "image_id": img,
                        "category_id": int(c),
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "score": float(score),
                    }
                    if rle is not None:
                        rec["segmentation"] = rle
                    records.append(rec)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(records, f)

    def _evaluate_task(self, task: str) -> Dict[str, float]:
        ranges = KP_AREA_RANGES if task == "keypoints" else AREA_RANGES
        ap_per_class = {area: [] for area in ranges}
        ap50, ap75 = [], []
        ap50_by_class = {}  # class idx -> AP50, for the OVD split metrics
        named = {}  # per-category AP (reference COCOEvaluator "AP-{cat}")
        for c in range(self.num_classes):
            has_gt = any(len(v) for v in self._gts.get(c, {}).values())
            if not has_gt:
                continue
            for area, (lo, hi) in ranges.items():
                precisions = self._class_pr(c, lo, hi, task)  # (T, 101)
                if precisions is None:
                    ap = np.nan
                else:
                    ap = float(np.mean(precisions))
                ap_per_class[area].append(ap)
                if area == "all":
                    if self.class_names and c < len(self.class_names):
                        named[f"AP-{self.class_names[c]}"] = 100 * ap if np.isfinite(ap) else float("nan")
                    if precisions is not None:
                        ap50.append(float(np.mean(precisions[0])))
                        ap75.append(float(np.mean(precisions[5])))
                        ap50_by_class[c] = ap50[-1]
        # Generalized zero-shot (OVD) splits: when evaluating the 65-class
        # open-vocabulary setting, report AP50 over the novel ("target"),
        # base, and all splits (reference coco_evaluation.py:344-374, the
        # OVR-CNN protocol; the reference only logs these — here they are
        # returned as metrics, scaled x100 like the rest)
        splits = {}
        if task == "bbox" and self.class_names and len(self.class_names) == 65:
            from ..data.datasets.coco_zeroshot_categories import (
                COCO_OVD_ALL_CLS,
                COCO_SEEN_CLS,
                COCO_UNSEEN_CLS,
            )

            for split, names in (
                ("target", COCO_UNSEEN_CLS),
                ("base", COCO_SEEN_CLS),
                ("all", COCO_OVD_ALL_CLS),
            ):
                wanted = set(names)
                vals = [
                    v for c, v in ap50_by_class.items() if self.class_names[c] in wanted
                ]
                splits[f"AP50_split_{split}"] = (
                    100 * float(np.mean(vals)) if vals else -1.0
                )
        return {
            **splits,
            "AP": 100 * float(np.nanmean(ap_per_class["all"])) if ap_per_class["all"] else float("nan"),
            "AP50": 100 * float(np.mean(ap50)) if ap50 else float("nan"),
            "AP75": 100 * float(np.mean(ap75)) if ap75 else float("nan"),
            "APs": 100 * float(np.nanmean(ap_per_class["small"])) if ap_per_class.get("small") else float("nan"),
            "APm": 100 * float(np.nanmean(ap_per_class["medium"])) if ap_per_class["medium"] else float("nan"),
            "APl": 100 * float(np.nanmean(ap_per_class["large"])) if ap_per_class["large"] else float("nan"),
            **named,
        }

    def _class_pr(self, c: int, area_lo: float, area_hi: float, task: str = "bbox"):
        T = len(IOU_THRESHOLDS)
        all_scores, all_tp, all_ign = [], [], []
        npos = 0
        det_imgs = self._dets.get(c, {})
        gt_imgs = self._gts.get(c, {})
        for img in self._images:
            gt_list = gt_imgs.get(img, [])
            gts = np.array([b for b, _, _ in gt_list]).reshape(-1, self.box_dim)
            iscrowd = np.array([cr for _, cr, _ in gt_list], bool)
            if task == "segm":
                from .masks import rle_area

                areas = np.array([rle_area(r) if r else 0.0 for _, _, r in gt_list])
            else:
                areas = self._box_area(gts)
            gt_ignore = iscrowd | (areas < area_lo) | (areas > area_hi)
            if task == "keypoints":
                # pycocotools _prepare: gts without labeled keypoints are
                # ignored for the keypoints task
                gkps = self._gt_kps.get(c, {}).get(img, [])
                n_lab = np.array(
                    [int((k[:, 2] > 0).sum()) if k is not None else 0 for k in gkps]
                ).reshape(-1)
                if len(n_lab) == len(gt_ignore):
                    gt_ignore = gt_ignore | (n_lab == 0)
            npos += int((~gt_ignore).sum())
            det_list = det_imgs.get(img, [])
            if not det_list:
                continue
            det_boxes = np.array([b for _, b, _ in det_list]).reshape(-1, self.box_dim)
            det_scores = np.array([s for s, _, _ in det_list])
            ious = self._box_iou(det_boxes, gts, iscrowd) if task == "bbox" else None
            if task == "segm":
                from .masks import mask_iou_matrix, rle_area

                det_rles = [r for _, _, r in det_list]
                gt_rles = [r for _, _, r in gt_list]
                if any(r is None for r in det_rles + gt_rles):
                    continue  # segm task without masks: skip image
                ious = mask_iou_matrix(det_rles, gt_rles, iscrowd)
            elif task == "keypoints":
                dkps = self._det_kps.get(c, {}).get(img, [])
                gkps = self._gt_kps.get(c, {}).get(img, [])
                if any(k is None for k in dkps) or any(k is None for k in gkps):
                    continue  # keypoints task without keypoints: skip image
                # empty lists (detections with no GT of this class, or vice
                # versa) -> 0-row arrays; _oks_matrix handles D==0 / G==0
                dk = np.stack(dkps) if dkps else np.zeros((0, 1, 3))
                gk = np.stack(gkps) if gkps else np.zeros((0, 1, 3))
                ious = _oks_matrix(dk, gk, gts, self.kpt_oks_sigmas)
            scores, tp, ign = _eval_image(
                det_boxes, det_scores, gts, gt_ignore, iscrowd, IOU_THRESHOLDS, ious=ious
            )
            # dets outside the area range that are unmatched -> ignored
            if task == "segm":
                d_areas = np.array([rle_area(r) for _, _, r in det_list], np.float64)
            else:
                d_areas = self._box_area(det_boxes)
            order = np.argsort(-det_scores, kind="stable")
            out_of_range = ((d_areas < area_lo) | (d_areas > area_hi))[order]
            ign = ign | (out_of_range[None, :] & ~tp)
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
        tp = tp[:, order]
        ign = ign[:, order]

        out = np.zeros((T, len(RECALL_POINTS)))
        for t in range(T):
            keep = ~ign[t]
            tps = np.cumsum(tp[t][keep])
            fps = np.cumsum(~tp[t][keep])
            rec = tps / npos
            prec = tps / np.maximum(tps + fps, 1e-10)
            # monotone precision envelope + 101-point interpolation
            for i in range(len(prec) - 1, 0, -1):
                prec[i - 1] = max(prec[i - 1], prec[i])
            idx = np.searchsorted(rec, RECALL_POINTS, side="left")
            out[t] = np.where(idx < len(prec), prec[np.minimum(idx, max(len(prec) - 1, 0))], 0.0) if len(prec) else 0.0
        return out
