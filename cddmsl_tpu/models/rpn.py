"""Region Proposal Network, TPU-native.

Same method as the reference RPN (detectron2/modeling/proposal_generator/
rpn.py:67 StandardRPNHead, :307-430 matching/sampling/losses, :482
predict_proposals; proposal_utils.py find_top_rpn_proposals), with the
static-shape deltas:
  * anchors are compile-time constants of the (padded) feature grid
  * sampling uses rank-by-random-key masks (models/sampling.py) instead of
    randperm index tensors
  * proposals are a fixed-capacity (B, K, 4) array + validity mask; NMS is
    the tiled-fixpoint kernel from ops/nms.py
All matching/sampling/NMS runs inside the one jitted train/eval step.
"""

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import anchor_grid, generate_cell_anchors
from ..ops.box_regression import Box2BoxTransform
from ..ops.nms import nms
from ..structures import boxes as box_ops
from .matcher import Matcher
from .sampling import subsample_labels


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (B, K, 4)
    scores: jnp.ndarray  # (B, K) objectness logits
    valid: jnp.ndarray  # (B, K) bool


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1; beta=0 degrades to L1 (fvcore semantics)."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


class StandardRPNHead(nn.Module):
    """3x3 conv + two sibling 1x1 convs (reference rpn.py:67).
    box_dim=5 gives the RRPN head (reference rrpn.py uses the same head with
    5-d anchor deltas)."""

    num_anchors: int
    conv_dim: int
    box_dim: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        t = nn.Conv(
            self.conv_dim, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name="conv"
        )(x)
        t = nn.relu(t)
        logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="objectness_logits"
        )(t)
        deltas = nn.Conv(
            self.num_anchors * self.box_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name="anchor_deltas"
        )(t)
        return logits, deltas


class RPN(nn.Module):
    """Single-level RPN (C4). Config fields mirror cfg.MODEL.RPN.*"""

    in_channels: int
    stride: int = 16
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_offset: float = 0.0
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.0
    loss_weight: float = 1.0
    pre_nms_topk_train: int = 12000
    pre_nms_topk_test: int = 6000
    post_nms_topk_train: int = 2000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.head = StandardRPNHead(
            num_anchors=len(self.anchor_sizes) * len(self.anchor_aspect_ratios),
            conv_dim=self.in_channels,
            dtype=self.dtype,
        )
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.matcher = Matcher(self.iou_thresholds, self.iou_labels, allow_low_quality_matches=True)
        self.cell_anchors = generate_cell_anchors(self.anchor_sizes, self.anchor_aspect_ratios)

    def _anchors(self, h: int, w: int) -> jnp.ndarray:
        return anchor_grid(h, w, self.stride, self.cell_anchors, self.anchor_offset)

    def __call__(
        self,
        features: jnp.ndarray,  # (B, H, W, C)
        image_sizes: jnp.ndarray,  # (B, 2) true (h, w)
        training: bool,
        gt_boxes: Optional[jnp.ndarray] = None,  # (B, G, 4)
        gt_valid: Optional[jnp.ndarray] = None,  # (B, G)
        rng: Optional[jax.Array] = None,
        compute_losses: bool = True,
    ) -> Tuple[Proposals, Dict[str, jnp.ndarray]]:
        b, h, w, _ = features.shape
        a = len(self.anchor_sizes) * len(self.anchor_aspect_ratios)
        logits_map, deltas_map = self.head(features)
        logits = logits_map.reshape(b, h * w * a).astype(jnp.float32)
        deltas = deltas_map.reshape(b, h * w * a, 4).astype(jnp.float32)
        anchors = self._anchors(h, w)  # (HWA, 4)

        losses: Dict[str, jnp.ndarray] = {}
        if training and compute_losses:
            assert gt_boxes is not None and rng is not None
            keys = jax.random.split(rng, b)
            losses = self._losses(anchors, logits, deltas, gt_boxes, gt_valid, keys)

        proposals = self._predict_proposals(anchors, logits, deltas, image_sizes, training)
        return proposals, losses

    # ---- training ----
    def _losses(self, anchors, logits, deltas, gt_boxes, gt_valid, keys):
        def per_image(logit, delta, gtb, gtv, key):
            iou = box_ops.pairwise_iou(gtb, anchors)  # (G, A)
            matched_idxs, match_labels = self.matcher(iou, gtv)
            pos_sel, neg_sel = subsample_labels(
                key, match_labels == 1, match_labels == 0,
                self.batch_size_per_image, self.positive_fraction,
            )
            matched_gt = gtb[matched_idxs]  # (A, 4)
            gt_deltas = self.box2box.get_deltas(anchors, matched_gt)

            loc = jnp.sum(
                smooth_l1(delta, gt_deltas, self.smooth_l1_beta) * pos_sel[:, None]
            )
            sampled = pos_sel | neg_sel
            cls_target = pos_sel.astype(jnp.float32)
            bce = jnp.maximum(logit, 0) - logit * cls_target + jnp.log1p(jnp.exp(-jnp.abs(logit)))
            cls = jnp.sum(bce * sampled)
            return loc, cls

        loc, cls = jax.vmap(per_image)(logits, deltas, gt_boxes, gt_valid, keys)
        normalizer = self.batch_size_per_image * logits.shape[0]
        return {
            "loss_rpn_cls": jnp.sum(cls) / normalizer * self.loss_weight,
            "loss_rpn_loc": jnp.sum(loc) / normalizer * self.loss_weight,
        }

    # ---- proposals ----
    def _predict_proposals(self, anchors, logits, deltas, image_sizes, training) -> Proposals:
        pre_k = self.pre_nms_topk_train if training else self.pre_nms_topk_test
        post_k = self.post_nms_topk_train if training else self.post_nms_topk_test
        n_anchors = anchors.shape[0]
        pre_k = min(pre_k, n_anchors)

        logits = jax.lax.stop_gradient(logits)
        deltas = jax.lax.stop_gradient(deltas)

        def per_image(logit, delta, hw):
            top_scores, top_idx = jax.lax.top_k(logit, pre_k)
            top_boxes = self.box2box.apply_deltas(delta[top_idx], anchors[top_idx])
            top_boxes = box_ops.clip(top_boxes, (hw[0], hw[1]))
            ok = box_ops.nonempty(top_boxes, self.min_box_size)
            # NaN/Inf guard (reference proposal_utils.py raises; we drop)
            ok &= jnp.all(jnp.isfinite(top_boxes), axis=-1) & jnp.isfinite(top_scores)
            idx, valid = nms(top_boxes, top_scores, self.nms_thresh, post_k, valid=ok)
            return top_boxes[idx], top_scores[idx], valid

        boxes, scores, valid = jax.vmap(per_image)(logits, deltas, image_sizes)
        return Proposals(boxes=boxes, scores=jnp.where(valid, scores, -jnp.inf), valid=valid)
