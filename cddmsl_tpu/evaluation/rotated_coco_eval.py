"""COCO-style AP for rotated (XYWHA) boxes.

Counterpart of the reference RotatedCOCOEvaluator / RotatedCOCOeval
(detectron2/evaluation/rotated_coco_evaluation.py:15-207): the standard
COCO PR machinery with the IoU matrix replaced by exact rotated-box IoU
(ops/rotated.py pairwise_iou_rotated — Sutherland-Hodgman polygon clip).
Matching the reference: bbox task only, no crowd support (the reference
asserts all iscrowd == 0, :60), box area = w * h.
"""

import numpy as np

from .coco_eval import COCOEvaluator


class RotatedCOCOEvaluator(COCOEvaluator):
    """COCOEvaluator over (N, 5) XYWHA boxes (absolute degrees)."""

    box_dim = 5

    def __init__(self, dataset_name: str = "", output_json=None):
        super().__init__(dataset_name, tasks=("bbox",), output_json=output_json)

    def _box_area(self, boxes: np.ndarray) -> np.ndarray:
        if len(boxes) == 0:
            return np.zeros(0)
        return boxes[:, 2] * boxes[:, 3]

    def _box_iou(self, dets: np.ndarray, gts: np.ndarray, iscrowd) -> np.ndarray:
        if len(dets) == 0 or len(gts) == 0:
            return np.zeros((len(dets), len(gts)))
        if np.any(iscrowd):
            # reference rotated_coco_evaluation.py:60 — crowd regions are
            # unsupported for rotated IoU there too
            raise NotImplementedError("RotatedCOCOEvaluator does not support crowd GT")
        import jax.numpy as jnp

        from ..ops.rotated import pairwise_iou_rotated

        return np.asarray(
            pairwise_iou_rotated(jnp.asarray(dets, jnp.float32), jnp.asarray(gts, jnp.float32))
        ).astype(np.float64)

    def dump_predictions(self, path: str) -> None:
        """XYWHA boxes dumped verbatim (reference instances_to_json keeps
        the 5-d layout)."""
        import json
        import os

        records = []
        for c, per_img in self._dets.items():
            for img, dets in per_img.items():
                for score, box, _ in dets:
                    records.append(
                        {
                            "image_id": img,
                            "category_id": int(c),
                            "bbox": [float(v) for v in box],
                            "score": float(score),
                        }
                    )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(records, f)
