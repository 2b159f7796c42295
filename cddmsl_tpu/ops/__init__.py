from .anchors import anchor_grid, generate_cell_anchors
from .box_regression import Box2BoxTransform
from .deform_conv import deform_conv2d, modulated_deform_conv2d
from .nms import batched_nms, batched_nms_mask, nms, nms_mask
from .roi_align import roi_align, roi_align_gather
from .rotated import (
    box_to_corners,
    nms_rotated,
    pairwise_iou_rotated,
    roi_align_rotated,
)
from .soft_nms import batched_soft_nms, soft_nms

__all__ = [
    "anchor_grid",
    "generate_cell_anchors",
    "Box2BoxTransform",
    "batched_nms",
    "batched_nms_mask",
    "nms",
    "nms_mask",
    "roi_align",
    "roi_align_gather",
    "batched_soft_nms",
    "soft_nms",
    "deform_conv2d",
    "modulated_deform_conv2d",
    "box_to_corners",
    "nms_rotated",
    "pairwise_iou_rotated",
    "roi_align_rotated",
]
