"""Cityscapes evaluators (reference detectron2/evaluation/
cityscapes_evaluation.py:194 CityscapesInstanceEvaluator +
CityscapesSemSegEvaluator). The reference shells out to the
`cityscapesscripts` package; that package is unavailable here, so:
  * instance AP is computed natively — Cityscapes instance AP is mean AP
    over IoU .50:.95 per thing class at the MASK level (reference
    cityscapes_evaluation.py:96-108 reports a "segm" AP via
    cityscapesscripts' mask matching); the COCO machinery computes it from
    the native RLE mask-IoU (evaluation/masks.py). When the model has no
    mask head (MASK_ON=False) the evaluator falls back to bbox IoU with a
    logged warning — a PROXY, not the published metric
  * semantic IoU reuses SemSegEvaluator over the 19 eval classes."""

import logging
from typing import Dict

from .coco_eval import COCOEvaluator
from .sem_seg_eval import SemSegEvaluator

CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


logger = logging.getLogger(__name__)


class CityscapesInstanceEvaluator(COCOEvaluator):
    def __init__(self, dataset_name: str = "", tasks=("segm",)):
        if "segm" not in tasks:
            logger.warning(
                "CityscapesInstanceEvaluator without a mask head: reporting "
                "bbox-IoU AP, a proxy for the published mask-level metric"
            )
        if dataset_name:
            try:
                super().__init__(dataset_name, tasks=tasks)
                return
            except KeyError:
                pass
        # fall back to the fixed 8 thing classes
        self.num_classes = len(CITYSCAPES_THING_CLASSES)
        self.class_names = CITYSCAPES_THING_CLASSES
        self.tasks = tuple(tasks)
        self.output_json = None
        self.reset()

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        out = super().evaluate()
        # cityscapesscripts reports AP and AP50 (no AP75/area splits)
        return {
            task: {"AP": res["AP"], "AP50": res["AP50"]} for task, res in out.items()
        }


class CityscapesSemSegEvaluator(SemSegEvaluator):
    """19-class semantic IoU (the cityscapesscripts evalPixelLevel metrics)."""

    CLASSES = [
        "road", "sidewalk", "building", "wall", "fence", "pole",
        "traffic light", "traffic sign", "vegetation", "terrain", "sky",
        "person", "rider", "car", "truck", "bus", "train", "motorcycle",
        "bicycle",
    ]

    def __init__(self, dataset_name: str = ""):
        super().__init__(
            dataset_name="", num_classes=len(self.CLASSES), ignore_label=255,
            class_names=self.CLASSES,
        )
