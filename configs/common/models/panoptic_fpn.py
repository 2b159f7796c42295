# Panoptic FPN (reference configs/common/models/panoptic_fpn.py).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.panoptic_fpn import PanopticFPN

model = L(PanopticFPN)(
    num_classes=80,
    sem_seg_classes=54,
    depth=50,
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
)
