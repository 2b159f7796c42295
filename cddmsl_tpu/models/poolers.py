"""Multi-level ROI pooling (reference detectron2/modeling/poolers.py:98-250
ROIPooler + assign_boxes_to_levels :22).

Static-shape strategy: every ROI is pooled from EVERY level and the result is
selected by the level-assignment mask (levels are few; the selects are free
next to the matmuls). Level assignment follows the FPN paper:
level = floor(4 + log2(sqrt(area)/224)) clamped to [min, max]."""

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align
from ..structures import boxes as box_ops


def assign_boxes_to_levels(
    boxes: jnp.ndarray, min_level: int, max_level: int, canonical_size: int = 224, canonical_level: int = 4
) -> jnp.ndarray:
    """(..., 4) -> (...,) int32 level indices in [min_level, max_level]."""
    area = jnp.maximum(box_ops.area(boxes), 1e-6)
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


class ROIPooler:
    def __init__(
        self,
        output_size: int,
        scales: Sequence[float],
        sampling_ratio: int = 0,
        min_level: int = 2,
        canonical_size: int = 224,
    ):
        self.output_size = output_size
        self.scales = tuple(scales)
        self.sampling_ratio = sampling_ratio
        self.min_level = min_level
        self.max_level = min_level + len(scales) - 1
        self.canonical_size = canonical_size

    def __call__(self, features: Sequence[jnp.ndarray], boxes: jnp.ndarray) -> jnp.ndarray:
        """features: list of (H_l, W_l, C) maps (finest first); boxes (R, 4)
        -> (R, P, P, C)."""
        if len(features) == 1:
            return roi_align(
                features[0], boxes, (self.output_size, self.output_size),
                self.scales[0], self.sampling_ratio, True,
            )
        levels = assign_boxes_to_levels(boxes, self.min_level, self.max_level, self.canonical_size)
        pooled = None
        for i, (feat, scale) in enumerate(zip(features, self.scales)):
            p = roi_align(
                feat, boxes, (self.output_size, self.output_size), scale, self.sampling_ratio, True
            )
            sel = (levels == self.min_level + i)[:, None, None, None]
            pooled = jnp.where(sel, p, pooled) if pooled is not None else jnp.where(sel, p, 0.0)
        return pooled
