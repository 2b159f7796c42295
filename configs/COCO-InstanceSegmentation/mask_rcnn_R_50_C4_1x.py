# reference configs/COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.py
import os

from cddmsl_tpu.config.lazy import LazyConfig

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "mask_rcnn_c4.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
lr_multiplier = LazyConfig.load(os.path.join(_common, "coco_schedule.py"), "lr_multiplier_1x")
dataloader = LazyConfig.load(os.path.join(_common, "data", "coco.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")
