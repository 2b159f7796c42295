"""Soft-NMS (gaussian / linear / hard), pure XLA.

Same rescoring semantics as the reference's pure-python implementation
(detectron2/layers/soft_nms.py:8-186): iteratively select the highest-scoring
remaining box and decay the scores of overlapping boxes. Inherently greedy-
sequential, so this is a `lax.fori_loop` over selections — it is off the
default hot path (cfg MODEL.ROI_HEADS.SOFT_NMS_ENABLED=False), matching the
reference.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    method: str = "gaussian",
    gaussian_sigma: float = 0.5,
    linear_threshold: float = 0.3,
    prune_threshold: float = 0.001,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (idx (max_out,), new_scores (max_out,), out_valid (max_out,))."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    iou = pairwise_iou(boxes, boxes)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def body(i, state):
        # `remaining` holds current (decayed) scores; 0 for consumed/invalid.
        remaining, out_idx, out_scores = state
        j = jnp.argmax(remaining)
        sj = remaining[j]
        picked = sj > prune_threshold
        out_idx = out_idx.at[i].set(jnp.where(picked, j, 0).astype(jnp.int32))
        out_scores = out_scores.at[i].set(jnp.where(picked, sj, neg_inf))
        ious = iou[j]
        if method == "linear":
            decay = jnp.where(ious > linear_threshold, 1.0 - ious, 1.0)
        elif method == "hard":
            decay = jnp.where(ious > linear_threshold, 0.0, 1.0)
        else:  # gaussian
            decay = jnp.exp(-(ious ** 2) / gaussian_sigma)
        new_remaining = remaining * decay
        new_remaining = new_remaining.at[j].set(0.0)  # consumed
        new_remaining = jnp.where(picked, new_remaining, jnp.zeros_like(remaining))
        return new_remaining, out_idx, out_scores

    remaining0 = jnp.where(valid, scores.astype(jnp.float32), 0.0)
    _, out_idx, out_scores = jax.lax.fori_loop(
        0,
        max_out,
        body,
        (
            remaining0,
            jnp.zeros((max_out,), jnp.int32),
            jnp.full((max_out,), neg_inf),
        ),
    )
    out_valid = out_scores > neg_inf
    return out_idx, jnp.where(out_valid, out_scores, 0.0), out_valid


def batched_soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    method: str = "gaussian",
    gaussian_sigma: float = 0.5,
    linear_threshold: float = 0.3,
    prune_threshold: float = 0.001,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,
):
    """Class-aware soft-NMS via the coordinate offset trick
    (reference layers/soft_nms.py:85 `batched_soft_nms`)."""
    if valid is None:
        valid = jnp.ones(boxes.shape[:1], dtype=bool)
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    return soft_nms(
        boxes + offsets[:, None],
        scores,
        method=method,
        gaussian_sigma=gaussian_sigma,
        linear_threshold=linear_threshold,
        prune_threshold=prune_threshold,
        max_out=max_out,
        valid=valid,
    )
