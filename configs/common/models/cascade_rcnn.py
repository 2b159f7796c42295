# Cascade R-CNN (reference configs/common/models/cascade_rcnn.py: the
# mask_rcnn_fpn model with CascadeROIHeads and per-stage IoU thresholds
# 0.5/0.6/0.7; this repo's cascade assembly is the C4 CascadeRCNN meta-arch,
# models/cascade_rcnn.py).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.cascade_rcnn import CascadeRCNN

model = L(CascadeRCNN)(
    num_classes=80,
    depth=50,
    stage_ious=(0.5, 0.6, 0.7),
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
)
