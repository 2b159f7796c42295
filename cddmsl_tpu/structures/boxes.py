"""Box math as pure jnp functions over (..., 4) XYXY arrays.

TPU-first replacement for the reference's `Boxes` class
(detectron2/structures/boxes.py): instead of a tensor-wrapping object we keep
boxes as plain arrays and expose the same operations functionally, so they
trace cleanly under jit/vmap. Padded (invalid) boxes are all-zero rows;
`nonempty` doubles as the validity predicate.
"""

import enum
from typing import Tuple

import jax.numpy as jnp


class BoxMode(enum.IntEnum):
    """Same semantics as reference detectron2/structures/boxes.py BoxMode."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        if from_mode == to_mode:
            return box
        arr = jnp.asarray(box, dtype=jnp.float32)
        if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
            return arr.at[..., 2:4].set(arr[..., 0:2] + arr[..., 2:4]) if False else jnp.concatenate(
                [arr[..., :2], arr[..., :2] + arr[..., 2:4]], axis=-1
            )
        if from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            return jnp.concatenate([arr[..., :2], arr[..., 2:4] - arr[..., :2]], axis=-1)
        raise NotImplementedError(f"BoxMode conversion {from_mode} -> {to_mode}")


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) XYXY -> (...)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def clip(boxes: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Clip boxes to [0, W] x [0, H]. image_size is (H, W) like the reference."""
    h, w = image_size[0], image_size[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """(..., 4) -> (...) bool: width and height both > threshold."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., :2] + boxes[..., 2:4]) * 0.5


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,4),(M,4) -> (N,M) intersection areas."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,4),(M,4) -> (N,M) IoU. Zero-area pairs give 0 (reference boxes.py pairwise_iou)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection over area of boxes2: (N,M)."""
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = area(boxes2)[None, :]
    return jnp.where(a2 > 0, inter / jnp.where(a2 > 0, a2, 1.0), 0.0)


def matched_pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned (N,4),(N,4) -> (N,)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned (N,4),(N,4) -> (N,) in [-1, 1]."""
    iou = matched_pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    enclosing = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    inter_rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = area(boxes1) + area(boxes2) - inter
    return iou - jnp.where(enclosing > 0, (enclosing - union) / jnp.where(enclosing > 0, enclosing, 1.0), 0.0)
