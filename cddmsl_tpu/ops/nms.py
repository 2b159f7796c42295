"""Greedy NMS, TPU-native.

Replaces torchvision's CUDA `nms` / `batched_nms` (reference
detectron2/layers/nms.py:6-43) with a tiled fixpoint algorithm that maps onto
the VPU: boxes are sorted by score and processed in tiles; each tile is first
suppressed by the kept set of earlier tiles (one (T, N) IoU block), then
resolved internally by iterating `kept -> active & ~suppressed_by(kept)` to
fixpoint — which converges to exactly the sequential greedy solution because
the suppression mask is strictly upper-triangular in score order. Sequential
depth is O(N/T + chain length), not O(N).

All shapes static: inputs are fixed-capacity padded arrays with a validity
mask; output is a fixed `max_out` index list + validity mask.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou

_TILE = 256


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0, value=0):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
    tile: int = _TILE,
) -> jnp.ndarray:
    """Greedy NMS keep-mask.

    Args:
      boxes: (N, 4) XYXY.
      scores: (N,).
      valid: optional (N,) bool; padded rows never kept, never suppress.
    Returns:
      (N,) bool keep mask (in the ORIGINAL order).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid, scores, neg_inf)

    _, order = jax.lax.top_k(masked_scores, n)  # stable: ties keep lower index first
    bs = boxes[order]
    vs = valid[order]

    bs_p = _pad_to_multiple(bs, tile)
    vs_p = _pad_to_multiple(vs, tile)
    n_pad = bs_p.shape[0]
    num_tiles = n_pad // tile

    def tile_body(i, kept):
        start = i * tile
        tb = jax.lax.dynamic_slice(bs_p, (start, 0), (tile, 4))
        tv = jax.lax.dynamic_slice(vs_p, (start,), (tile,))

        # suppression by kept boxes from earlier tiles (positions < start)
        iou_cross = pairwise_iou(tb, bs_p)  # (T, Np)
        earlier = jnp.arange(n_pad) < start
        sup_prev = jnp.any((iou_cross > iou_threshold) & (kept & earlier)[None, :], axis=1)
        active0 = tv & ~sup_prev

        # within-tile fixpoint to the greedy solution
        iou_self = pairwise_iou(tb, tb)
        rows = jnp.arange(tile)
        upper = rows[None, :] > rows[:, None]  # col strictly after row in score order
        sup_mask = (iou_self > iou_threshold) & upper

        def cond(state):
            cur, prev, it = state
            return jnp.logical_and(it < tile, jnp.any(cur != prev))

        def body(state):
            cur, _, it = state
            sup = jnp.any(sup_mask & cur[:, None], axis=0)
            return active0 & ~sup, cur, it + 1

        kept_tile, _, _ = jax.lax.while_loop(cond, body, (active0, ~active0, 0))
        return jax.lax.dynamic_update_slice(kept, kept_tile, (start,))

    kept_sorted = jax.lax.fori_loop(
        0, num_tiles, tile_body, jnp.zeros((n_pad,), dtype=bool)
    )[:n]

    # map back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(kept_sorted)
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning fixed-size top-`max_out` kept indices.

    Returns:
      idx: (max_out,) int32 indices into the input, score-descending; padded
        entries point at index 0.
      out_valid: (max_out,) bool.
    """
    n = boxes.shape[0]
    keep = nms_mask(boxes, scores, iou_threshold, valid=valid)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    kept_scores = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(kept_scores, min(max_out, n))
    out_valid = top_scores > neg_inf
    idx = jnp.where(out_valid, idx, 0)
    if max_out > n:
        idx = jnp.pad(idx, (0, max_out - n))
        out_valid = jnp.pad(out_valid, (0, max_out - n))
    return idx.astype(jnp.int32), out_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick (reference
    detectron2/layers/nms.py:16-43 `batched_nms`): boxes of different `idxs`
    are shifted apart so they never overlap, then a single NMS runs."""
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True, boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_out, valid=valid)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True, boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    return nms_mask(boxes + offsets[:, None], scores, iou_threshold, valid=valid)
