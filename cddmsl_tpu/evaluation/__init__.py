from .cityscapes_eval import CityscapesInstanceEvaluator, CityscapesSemSegEvaluator
from .coco_eval import COCOEvaluator
from .evaluator import inference_on_dataset, print_csv_format, verify_results
from .lvis_eval import LVISEvaluator
from .pascal_voc import PascalVOCDetectionEvaluator, voc_ap, voc_eval_class
from .sem_seg_eval import SemSegEvaluator

__all__ = [
    "inference_on_dataset",
    "print_csv_format",
    "verify_results",
    "COCOEvaluator",
    "LVISEvaluator",
    "SemSegEvaluator",
    "CityscapesInstanceEvaluator",
    "CityscapesSemSegEvaluator",
    "PascalVOCDetectionEvaluator",
    "voc_ap",
    "voc_eval_class",
]
