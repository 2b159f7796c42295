from .cityscapes_eval import CityscapesInstanceEvaluator, CityscapesSemSegEvaluator
from .coco_eval import COCOEvaluator
from .evaluator import inference_on_dataset, print_csv_format, verify_results
from .lvis_eval import LVISEvaluator
from .panoptic_eval import COCOPanopticEvaluator, inference_on_dataset_panoptic
from .pascal_voc import PascalVOCDetectionEvaluator, voc_ap, voc_eval_class
from .rotated_coco_eval import RotatedCOCOEvaluator
from .sem_seg_eval import SemSegEvaluator

__all__ = [
    "inference_on_dataset",
    "inference_on_dataset_panoptic",
    "print_csv_format",
    "verify_results",
    "COCOEvaluator",
    "COCOPanopticEvaluator",
    "RotatedCOCOEvaluator",
    "LVISEvaluator",
    "SemSegEvaluator",
    "CityscapesInstanceEvaluator",
    "CityscapesSemSegEvaluator",
    "PascalVOCDetectionEvaluator",
    "voc_ap",
    "voc_eval_class",
]
