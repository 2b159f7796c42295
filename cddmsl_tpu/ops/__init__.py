from .anchors import anchor_grid, generate_cell_anchors
from .box_regression import Box2BoxTransform
from .nms import batched_nms, batched_nms_mask, nms, nms_mask
from .roi_align import roi_align, roi_align_gather
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
]
