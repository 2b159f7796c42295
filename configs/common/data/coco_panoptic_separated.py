# COCO panoptic dataloader fragment (reference configs/common/data/
# coco_panoptic_separated.py): the panoptic datasets — the train loader
# auto-selects PanopticDatasetMapper for pan_seg dicts, and the PQ
# evaluator rides evaluator_type coco_panoptic_seg.
import os

from cddmsl_tpu.config.lazy import LazyConfig

dataloader = LazyConfig.load(os.path.join(os.path.dirname(__file__), "coco.py"), "dataloader")
dataloader["train"]["dataset"] = "coco_2017_train_panoptic"
dataloader["train"]["mask_on"] = False
dataloader["test"]["dataset"] = "coco_2017_val_panoptic"
dataloader["evaluator_dataset"] = "coco_2017_val_panoptic"
