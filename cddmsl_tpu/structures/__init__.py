from .boxes import (
    BoxMode,
    area,
    centers,
    clip,
    matched_pairwise_iou,
    nonempty,
    pairwise_giou,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
)
from .instances import Instances
from .image_list import ImageList

__all__ = [
    "BoxMode",
    "Instances",
    "ImageList",
    "area",
    "centers",
    "clip",
    "matched_pairwise_iou",
    "nonempty",
    "pairwise_giou",
    "pairwise_intersection",
    "pairwise_ioa",
    "pairwise_iou",
]
