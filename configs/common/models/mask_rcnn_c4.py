# Mask R-CNN R50-C4 (reference configs/common/models/mask_rcnn_c4.py):
# d2-ResNet backbone, C4 RoI heads with the mask branch sharing pooled res5.
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.rcnn import GeneralizedRCNN

model = L(GeneralizedRCNN)(
    backbone_type="d2_resnet",
    backbone_depth=50,
    embed_dim=2048,  # res5 channels, mean-pooled
    num_classes=80,
    use_text_emb=False,
    with_offline_backbone=False,
    mask_on=True,
    # caffe2-style BGR stats of the d2 zoo (reference mask_rcnn_c4.py
    # pixel_mean/std); INPUT.FORMAT handles channel order at load time
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
)
