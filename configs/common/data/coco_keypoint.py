# COCO-keypoints dataloader fragment (reference configs/common/data/
# coco_keypoint.py: the coco fragment with keypoint flags and
# min_keypoints filtering).
import os

from cddmsl_tpu.config.lazy import LazyConfig

dataloader = LazyConfig.load(os.path.join(os.path.dirname(__file__), "coco.py"), "dataloader")
dataloader["train"]["mask_on"] = False
dataloader["train"]["keypoint_on"] = True
dataloader["train"]["num_keypoints"] = 17
