"""Panoptic Quality (PQ/SQ/RQ) evaluation, natively.

TPU-native counterpart of the reference COCOPanopticEvaluator
(detectron2/evaluation/panoptic_evaluation.py:24-165), which shells out to
panopticapi's `pq_compute`. Here the metric itself is implemented from the
PQ definition (Kirillov et al., "Panoptic Segmentation"): per image, GT and
prediction are integer segment-id maps; segments of the same category match
when IoU > 0.5 (IoU excludes pixels that are VOID in the GT), and per
category

    PQ = sum(IoU of TPs) / (TP + FP/2 + FN/2),   SQ = sum(IoU)/TP,
    RQ = TP / (TP + FP/2 + FN/2)

with panopticapi's exact void/crowd semantics:
  * VOID (id 0) GT pixels are excluded from the union of a candidate match
    (union -= |pred ∩ gt-void|);
  * crowd GT segments never match and are not FNs, but an unmatched
    prediction whose pixels fall >50% inside VOID + same-class crowd regions
    is ignored rather than counted FP.

The evaluator consumes the host-side combine output of PanopticFPN
(models/panoptic_fpn.py combine_semantic_and_instance_outputs): an (H, W)
int id map plus `segments_info` dicts {id, category_id, isthing}; GT comes
from the panoptic PNG (rgb2id) + its segments_info
(data/datasets/coco_panoptic.py).
"""

import logging
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

VOID = 0
_OFFSET = np.int64(1) << 32


class PQStat:
    """Per-(category, isthing) TP/FP/FN/IoU accumulator (panopticapi PQStat)."""

    def __init__(self):
        # (category_id, isthing) -> [iou_sum, tp, fp, fn]
        self.stats: Dict[Tuple[int, bool], List[float]] = defaultdict(lambda: [0.0, 0, 0, 0])

    def __iadd__(self, other: "PQStat"):
        for k, v in other.stats.items():
            mine = self.stats[k]
            for i in range(4):
                mine[i] += v[i]
        return self

    def average(self, isthing: Optional[bool] = None) -> Dict[str, float]:
        """Mean PQ/SQ/RQ over categories with tp+fp+fn > 0 (panopticapi
        PQStat.pq_average)."""
        pq = sq = rq = 0.0
        n = 0
        for (cat, thing), (iou, tp, fp, fn) in self.stats.items():
            if isthing is not None and thing != isthing:
                continue
            if tp + fp + fn == 0:
                continue
            n += 1
            denom = tp + 0.5 * fp + 0.5 * fn
            pq += iou / denom
            sq += iou / tp if tp else 0.0
            rq += tp / denom
        if n == 0:
            return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
        return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}


def pq_compute_single_image(
    pan_gt: np.ndarray,
    gt_segments: Sequence[dict],
    pan_pred: np.ndarray,
    pred_segments: Sequence[dict],
) -> PQStat:
    """panopticapi pq_compute_single_core, one image.

    `pan_gt`/`pan_pred`: (H, W) int id maps, 0 = VOID/unassigned.
    `gt_segments`: dicts {id, category_id, isthing, iscrowd?}.
    `pred_segments`: dicts {id, category_id, isthing}.
    Segment areas are computed from the maps (ids present in segments_info
    but absent from the map contribute nothing, matching panopticapi's
    area bookkeeping after its consistency checks).
    """
    stat = PQStat()
    pan_gt = np.asarray(pan_gt, np.int64)
    pan_pred = np.asarray(pan_pred, np.int64)
    if pan_gt.shape != pan_pred.shape:
        raise ValueError(f"gt {pan_gt.shape} vs pred {pan_pred.shape} shape mismatch")

    gt_by_id = {int(s["id"]): s for s in gt_segments}
    pred_by_id = {int(s["id"]): s for s in pred_segments}

    # areas from the maps
    gt_ids, gt_counts = np.unique(pan_gt, return_counts=True)
    pred_ids, pred_counts = np.unique(pan_pred, return_counts=True)
    gt_area = dict(zip(gt_ids.tolist(), gt_counts.tolist()))
    pred_area = dict(zip(pred_ids.tolist(), pred_counts.tolist()))

    # confusion: every (gt_id, pred_id) intersection in one pass
    combined = pan_gt * _OFFSET + pan_pred
    pair_ids, pair_counts = np.unique(combined, return_counts=True)
    inter = {
        (int(p // _OFFSET), int(p % _OFFSET)): int(c)
        for p, c in zip(pair_ids.tolist(), pair_counts.tolist())
    }

    gt_matched, pred_matched = set(), set()
    for (g, p), intersection in inter.items():
        if g not in gt_by_id or p not in pred_by_id:
            continue
        gi, pi = gt_by_id[g], pred_by_id[p]
        if gi.get("iscrowd", 0):
            continue
        # category match; `isthing` also compared because this evaluator
        # keeps the loader's dual contiguous spaces (thing-space ids would
        # otherwise collide with unrelated stuff-space ids — panopticapi has
        # one category space so equality alone suffices there)
        if gi["category_id"] != pi["category_id"] or bool(
            gi.get("isthing", True)
        ) != bool(pi.get("isthing", True)):
            continue
        union = (
            pred_area.get(p, 0)
            + gt_area.get(g, 0)
            - intersection
            - inter.get((VOID, p), 0)
        )
        if union <= 0:
            continue
        iou = intersection / union
        if iou > 0.5:
            key = (int(gi["category_id"]), bool(gi.get("isthing", True)))
            s = stat.stats[key]
            s[0] += iou
            s[1] += 1
            gt_matched.add(g)
            pred_matched.add(p)

    # FN (non-crowd unmatched GT); remember crowd regions per category
    crowd_by_cat: Dict[int, int] = {}
    for g, gi in gt_by_id.items():
        if g in gt_matched or gt_area.get(g, 0) == 0:
            continue
        if gi.get("iscrowd", 0):
            crowd_by_cat[int(gi["category_id"])] = g
            continue
        stat.stats[(int(gi["category_id"]), bool(gi.get("isthing", True)))][3] += 1

    # FP (unmatched predictions not >50% void/crowd-of-same-class)
    for p, pi in pred_by_id.items():
        if p in pred_matched:
            continue
        area = pred_area.get(p, 0)
        if area == 0:
            continue
        ignored = inter.get((VOID, p), 0)
        crowd = crowd_by_cat.get(int(pi["category_id"]))
        if crowd is not None:
            ignored += inter.get((crowd, p), 0)
        if ignored / area > 0.5:
            continue
        stat.stats[(int(pi["category_id"]), bool(pi.get("isthing", True)))][2] += 1

    return stat


class COCOPanopticEvaluator:
    """Native-PQ counterpart of the reference COCOPanopticEvaluator
    (panoptic_evaluation.py:24): accumulates (id-map, segments_info) pairs
    per image and reports PQ/SQ/RQ for All/Things/Stuff.

    Unlike the reference (which round-trips PNG files through panopticapi),
    predictions and GT are matched in memory per image_id. Category ids are
    compared verbatim — callers must put GT and predictions in the same
    category space (the contiguous thing/stuff spaces of the panoptic
    loader work: thing segments carry thing-space ids, stuff segments
    stuff-space ids, disambiguated by `isthing`).
    """

    tasks = ("panoptic_seg",)

    def __init__(self, dataset_name: str = "", output_dir: Optional[str] = None):
        self.dataset_name = dataset_name
        self.output_dir = output_dir
        self.reset()

    def reset(self):
        self._preds: Dict[object, Tuple[np.ndarray, list]] = {}
        self._gts: Dict[object, Tuple[np.ndarray, list]] = {}

    def process(self, image_id, panoptic_ids: np.ndarray, segments_info: List[dict]):
        self._preds[image_id] = (np.asarray(panoptic_ids), list(segments_info))

    def process_gt(self, image_id, panoptic_ids: np.ndarray, segments_info: List[dict]):
        self._gts[image_id] = (np.asarray(panoptic_ids), list(segments_info))

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        total = PQStat()
        missing = 0
        for image_id, (gt_map, gt_segs) in self._gts.items():
            if image_id not in self._preds:
                # unpredicted image: every non-crowd GT segment is a FN
                pred = (np.zeros_like(gt_map), [])
                missing += 1
            else:
                pred = self._preds[image_id]
            total += pq_compute_single_image(gt_map, gt_segs, pred[0], pred[1])
        if missing:
            logger.warning("%d images had GT but no prediction (counted as FNs)", missing)
        out = {}
        for name, flag in (("", None), ("_th", True), ("_st", False)):
            avg = total.average(isthing=flag)
            out[f"PQ{name}"] = 100.0 * avg["pq"]
            out[f"SQ{name}"] = 100.0 * avg["sq"]
            out[f"RQ{name}"] = 100.0 * avg["rq"]
        logger.info(
            "Panoptic results: PQ %.3f SQ %.3f RQ %.3f (th %.3f / st %.3f)",
            out["PQ"], out["SQ"], out["RQ"], out["PQ_th"], out["PQ_st"],
        )
        return {"panoptic_seg": out}


def _nearest_resize(m: np.ndarray, hw) -> np.ndarray:
    """(h, w) int map -> (H, W) by nearest (half-pixel centers)."""
    H, W = int(hw[0]), int(hw[1])
    h, w = m.shape
    if (h, w) == (H, W):
        return m
    yi = np.minimum(((np.arange(H) + 0.5) * h / H).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(W) + 0.5) * w / W).astype(np.int64), w - 1)
    return m[yi][:, xi]


def _load_gt_panoptic(meta: dict):
    """GT (id map, segments_info) from a panoptic dataset dict: either
    preloaded `pan_seg_ids` or the panoptic PNG at `pan_seg_file_name`
    (rgb2id decode — data/datasets/coco_panoptic.py)."""
    if "pan_seg_ids" in meta:
        return np.asarray(meta["pan_seg_ids"]), meta["segments_info"]
    if "pan_seg_file_name" in meta:
        from PIL import Image

        from ..data.datasets.coco_panoptic import rgb2id

        png = np.asarray(Image.open(meta["pan_seg_file_name"]).convert("RGB"))
        return rgb2id(png), meta["segments_info"]
    return None, None


def inference_on_dataset_panoptic(
    panoptic_infer,  # (params, DetBatch) -> (DetectionResult, sem_seg argmax)
    params,
    data_loader,
    evaluator: COCOPanopticEvaluator,
    combine_kwargs: Optional[dict] = None,
    place_fn=None,
) -> Dict[str, Dict[str, float]]:
    """Panoptic analogue of evaluation/evaluator.py inference_on_dataset:
    runs the jitted PanopticFPN inference, postprocesses to original-image
    coords on host (crop the padded sem-seg to the true image size, nearest-
    resize to the original resolution, rescale boxes — reference
    panoptic_fpn.py inference + detector_postprocess/sem_seg_postprocess),
    host-combines instances + stuff into an id map
    (combine_semantic_and_instance_outputs), and feeds the PQ evaluator.
    GT comes from the panoptic PNG referenced by each meta
    (`pan_seg_file_name` + `segments_info`, or preloaded `pan_seg_ids`).
    """
    from ..models.panoptic_fpn import combine_semantic_and_instance_outputs

    evaluator.reset()
    kw = combine_kwargs or {}
    for batch, metas in data_loader:
        if place_fn is not None:
            batch = place_fn(batch)
        det, sem_seg = panoptic_infer(params, batch)
        from ..parallel.multihost import fetch  # np.asarray + multi-host replication

        boxes = fetch(det.boxes)
        scores = fetch(det.scores)
        classes = fetch(det.classes)
        valid = fetch(det.valid)
        masks = fetch(det.masks)
        sem = fetch(sem_seg)
        sizes = fetch(batch.image_sizes)
        origs = fetch(batch.orig_sizes)
        for i, meta in enumerate(metas):
            h, w = sizes[i]
            oh, ow = origs[i]
            sem_i = _nearest_resize(sem[i][:h, :w], (oh, ow))
            sx, sy = ow / max(w, 1), oh / max(h, 1)
            boxes_i = boxes[i] * np.array([sx, sy, sx, sy], np.float32)
            pan, segs = combine_semantic_and_instance_outputs(
                boxes_i, scores[i], classes[i], valid[i], sem_i,
                det_masks=masks[i] if masks is not None else None, **kw
            )
            evaluator.process(meta["image_id"], pan, segs)
            gt_map, gt_segs = _load_gt_panoptic(meta)
            if gt_map is not None:
                evaluator.process_gt(meta["image_id"], gt_map, gt_segs)
    return evaluator.evaluate()
