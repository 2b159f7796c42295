# RetinaNet R50-FPN (reference configs/common/models/retinanet.py).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.retinanet import RetinaNet

model = L(RetinaNet)(
    num_classes=80,
    depth=50,
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(57.375, 57.12, 58.395),
)
