# reference configs/COCO-InstanceSegmentation/mask_rcnn_regnety_4gf_dds_fpn_1x.py:
# Mask R-CNN with a RegNetY-4GF (SE) bottom-up under the FPN.
import os

from cddmsl_tpu.config.lazy import LazyConfig

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "mask_rcnn_fpn.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
lr_multiplier = LazyConfig.load(os.path.join(_common, "coco_schedule.py"), "lr_multiplier_1x")
dataloader = LazyConfig.load(os.path.join(_common, "data", "coco.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")

model["backbone_type"] = "regnet"
# RegNetY-4GF (dds): w_a 31.41, w_0 96, w_m 2.24, depth 22, group width 64, SE 0.25
model["regnet_spec"] = (31.41, 96, 2.24, 22, 64, 0.25)
