"""Anchor grid generation.

Same anchor parameterization as the reference `DefaultAnchorGenerator`
(detectron2/modeling/anchor_generator.py:382): per-location anchors are the
outer product of sizes x aspect_ratios, centered with `offset`, tiled over the
feature grid at the given stride. Pure function of static shapes, so anchors
are compile-time constants under jit.
"""

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) XYXY anchors centered at (0, 0)."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


def anchor_grid(
    grid_height: int,
    grid_width: int,
    stride: int,
    cell_anchors: np.ndarray,
    offset: float = 0.0,
) -> jnp.ndarray:
    """(grid_h * grid_w * A, 4) anchors over the feature grid, row-major with
    the per-cell anchors fastest — matching the reference's memory order
    (anchor_generator.py `_grid_anchors`)."""
    shift_x = (np.arange(grid_width) + offset) * stride
    shift_y = (np.arange(grid_height) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)  # (HW, 4)
    all_anchors = shifts[:, None, :] + cell_anchors[None, :, :]  # (HW, A, 4)
    return jnp.asarray(all_anchors.reshape(-1, 4))
