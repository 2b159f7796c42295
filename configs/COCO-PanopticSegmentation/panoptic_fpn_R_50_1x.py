# reference configs/COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.py
import os

from cddmsl_tpu.config.lazy import LazyConfig

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "panoptic_fpn.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
lr_multiplier = LazyConfig.load(os.path.join(_common, "coco_schedule.py"), "lr_multiplier_1x")
dataloader = LazyConfig.load(os.path.join(_common, "data", "coco_panoptic_separated.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")
