# Keypoint R-CNN R50-FPN (reference configs/common/models/
# keypoint_rcnn_fpn.py: mask_rcnn_fpn with the mask branch swapped for the
# KRCNN keypoint branch, person-only).
import os

from cddmsl_tpu.config.lazy import LazyConfig

model = LazyConfig.load(os.path.join(os.path.dirname(__file__), "mask_rcnn_fpn.py"), "model")
model["mask_on"] = False
model["keypoint_on"] = True
model["num_keypoints"] = 17
model["num_classes"] = 1  # person
# reference keypoint_rcnn_fpn.py: keep more positives for the keypoint head
model["rpn_post_nms_topk"] = (1500, 1000)
model["roi_positive_fraction"] = 0.5
