"""Anchor/proposal <-> GT matching.

Same semantics as the reference `Matcher` (detectron2/modeling/matcher.py:126):
per-anchor max-IoU thresholding into labels, plus `allow_low_quality_matches`
(each GT's best anchors are forced positive). Operates on padded GT with a
validity mask: invalid GT columns are treated as IoU -1 so they can never
match, which also reproduces the reference's empty-GT special case (all
anchors negative).
"""

from typing import List, Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds == sorted(thresholds)
        assert all(l in [-1, 0, 1] for l in labels)
        assert len(labels) == len(thresholds) + 1
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, iou: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """iou: (G, A) pairwise IoU (gt rows, anchor cols — same orientation as
        the reference's match_quality_matrix); gt_valid: (G,) bool.

        Returns:
          matched_idxs: (A,) int32 — best gt index per anchor (0 if no valid gt)
          match_labels: (A,) int8 — 1 fg / 0 bg / -1 ignore
        """
        masked = jnp.where(gt_valid[:, None], iou, -1.0)  # (G, A)
        matched_vals = jnp.max(masked, axis=0) if iou.shape[0] > 0 else jnp.full(iou.shape[1:], -1.0)
        matched_idxs = jnp.argmax(masked, axis=0).astype(jnp.int32)

        match_labels = jnp.full(matched_vals.shape, self.labels[0], dtype=jnp.int8)
        for label, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_interval = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_interval, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            # for each valid gt, anchors tying its best IoU become fg
            # (reference matcher.py set_low_quality_matches_)
            highest_per_gt = jnp.max(masked, axis=1, keepdims=True)  # (G, 1)
            is_best = (masked == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > 0)
            anchor_is_best = jnp.any(is_best, axis=0)
            match_labels = jnp.where(anchor_is_best, jnp.int8(1), match_labels)

        return matched_idxs, match_labels
