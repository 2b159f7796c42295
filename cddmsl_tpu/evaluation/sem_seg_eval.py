"""Semantic segmentation evaluator (reference detectron2/evaluation/
sem_seg_evaluation.py:184 SemSegEvaluator): confusion-matrix based mIoU,
fwIoU, mACC, pACC and per-class IoU."""

from typing import Dict, Optional, Sequence

import numpy as np


def inference_on_dataset_semseg(
    semseg_infer,  # (params, DetBatch) -> (B, H, W) class maps (jitted)
    params,
    data_loader,
    evaluator: "SemSegEvaluator",
    place_fn=None,
) -> Dict[str, Dict[str, float]]:
    """Sem-seg analogue of evaluator.py inference_on_dataset: run the jitted
    SemanticSegmentor inference, crop each padded prediction to its true
    image size, nearest-resize to the original resolution (reference
    sem_seg_postprocess), and score against the labelTrainIds PNG referenced
    by each meta (`sem_seg_file_name`, or a preloaded `sem_seg_gt` array)."""
    from .panoptic_eval import _nearest_resize

    evaluator.reset()
    for batch, metas in data_loader:
        if place_fn is not None:
            batch = place_fn(batch)
        from ..parallel.multihost import fetch  # np.asarray + multi-host replication

        pred = fetch(semseg_infer(params, batch))
        sizes = fetch(batch.image_sizes)
        origs = fetch(batch.orig_sizes)
        for i, meta in enumerate(metas):
            h, w = sizes[i]
            pred_i = _nearest_resize(pred[i][:h, :w], origs[i])
            if "sem_seg_gt" in meta:
                gt = np.asarray(meta["sem_seg_gt"])
            elif "sem_seg_file_name" in meta:
                from PIL import Image

                gt = np.asarray(Image.open(meta["sem_seg_file_name"]), np.int32)
            else:
                continue
            evaluator.process(pred_i, gt)
    return evaluator.evaluate()


class SemSegEvaluator:
    def __init__(self, dataset_name: str = "", num_classes: int = 0,
                 ignore_label: int = 255, class_names: Optional[Sequence[str]] = None):
        if not num_classes and dataset_name:
            from ..data.catalog import MetadataCatalog

            meta = MetadataCatalog.get(dataset_name)
            class_names = class_names or meta.get("stuff_classes")
            num_classes = len(class_names) if class_names else 0
        assert num_classes > 0, "SemSegEvaluator needs num_classes"
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.class_names = list(class_names) if class_names else [str(i) for i in range(num_classes)]
        self.reset()

    def reset(self):
        self._conf = np.zeros((self.num_classes, self.num_classes), np.int64)

    def process(self, pred: np.ndarray, gt: np.ndarray):
        """pred, gt: (H, W) int class maps (gt may contain ignore_label)."""
        pred = np.asarray(pred).reshape(-1)
        gt = np.asarray(gt).reshape(-1)
        valid = gt != self.ignore_label
        gt = gt[valid]
        pred = np.clip(pred[valid], 0, self.num_classes - 1)
        idx = gt * self.num_classes + pred
        self._conf += np.bincount(idx, minlength=self.num_classes ** 2).reshape(
            self.num_classes, self.num_classes
        )

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        conf = self._conf.astype(np.float64)
        tp = np.diag(conf)
        pos_gt = conf.sum(axis=1)
        pos_pred = conf.sum(axis=0)
        union = pos_gt + pos_pred - tp
        iou = np.where(union > 0, tp / np.maximum(union, 1), np.nan)
        acc = np.where(pos_gt > 0, tp / np.maximum(pos_gt, 1), np.nan)
        freq = pos_gt / max(pos_gt.sum(), 1)
        res = {
            "mIoU": 100 * float(np.nanmean(iou)),
            "fwIoU": 100 * float(np.nansum(iou * freq)),
            "mACC": 100 * float(np.nanmean(acc)),
            "pACC": 100 * float(tp.sum() / max(pos_gt.sum(), 1)),
        }
        for i, name in enumerate(self.class_names):
            res[f"IoU-{name}"] = 100 * float(iou[i]) if np.isfinite(iou[i]) else float("nan")
        return {"sem_seg": res}
