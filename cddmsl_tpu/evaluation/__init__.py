from .evaluator import inference_on_dataset, print_csv_format, verify_results
from .pascal_voc import PascalVOCDetectionEvaluator, voc_ap, voc_eval_class

__all__ = [
    "inference_on_dataset",
    "print_csv_format",
    "verify_results",
    "PascalVOCDetectionEvaluator",
    "voc_ap",
    "voc_eval_class",
]
