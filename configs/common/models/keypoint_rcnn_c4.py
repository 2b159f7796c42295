# Keypoint R-CNN (reference configs/common/models/keypoint_rcnn_fpn.py,
# re-based on the C4 assembly this package's GeneralizedRCNN provides):
# person-only detection + 17-keypoint KRCNN head.
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.models.rcnn import GeneralizedRCNN

model = L(GeneralizedRCNN)(
    backbone_type="d2_resnet",
    backbone_depth=50,
    embed_dim=2048,
    num_classes=1,
    use_text_emb=False,
    with_offline_backbone=False,
    keypoint_on=True,
    num_keypoints=17,
    # RPN proposal counts follow the reference keypoint recipe
    rpn_post_nms_topk=(1500, 1000),
    pixel_mean=(103.53, 116.28, 123.675),
    pixel_std=(1.0, 1.0, 1.0),
)
