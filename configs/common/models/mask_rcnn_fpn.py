# Mask R-CNN R50-FPN (reference configs/common/models/mask_rcnn_fpn.py):
# d2-ResNet + FPN, shared multi-level RPN, ConvFC box head + mask branch.
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

model = L(FPNRCNN)(
    num_classes=80,
    depth=50,
    mask_on=True,
    use_text_emb=False,
    # caffe2-style BGR stats of the d2 zoo
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
)
