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
    # reference rpn.py box_reg_loss_type: giou decodes the anchors and
    # penalizes 1 - GIoU(pred, matched gt) on positives; BBOX_REG_LOSS_WEIGHT
    # scales only the localization term (the _giou zoo config uses 2.0)
    box_reg_loss_type: str = "smooth_l1"
    box_reg_loss_weight: float = 1.0
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
            if self.box_reg_loss_type == "giou":
                pred = self.box2box.apply_deltas(delta, anchors)
                loc = jnp.sum((1.0 - box_ops.pairwise_giou(pred, matched_gt)) * pos_sel)
            else:
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
            "loss_rpn_loc": jnp.sum(loc) / normalizer * self.loss_weight
            * self.box_reg_loss_weight,
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


class FPNRPN(RPN):
    """Multi-level RPN over FPN levels (reference rpn.py with
    cfg.MODEL.RPN.IN_FEATURES = p2..p6 + proposal_utils.py
    find_top_rpn_proposals): ONE shared head applied to every level,
    per-level anchor grids (one size per level x the shared aspect ratios),
    per-level pre-NMS top-k, then a single cross-level NMS via the
    level-offset trick (the reference's `batched_nms(boxes, scores, lvl)`
    with level ids as class ids, layers/nms.py:16-43), keeping the global
    top post_nms_topk by score.

    `anchor_sizes` holds one entry per level: a scalar (d2 FPN convention:
    ANCHOR_GENERATOR.SIZES = [[32],[64],[128],[256],[512]]) or a tuple of
    sizes (the DC5/C4 single-level convention, SIZES = [[32,...,512]]),
    paired with `strides`. The shared head requires the same anchor count
    on every level (d2's anchor generator has the same constraint)."""

    strides: Sequence[int] = (4, 8, 16, 32, 64)

    def setup(self):
        assert len(self.anchor_sizes) == len(self.strides), (
            "FPNRPN wants one anchor-size entry per pyramid level"
        )
        self.level_cell_anchors = [
            generate_cell_anchors(
                tuple(size) if isinstance(size, (tuple, list)) else (size,),
                self.anchor_aspect_ratios,
            )
            for size in self.anchor_sizes
        ]
        counts = {c.shape[0] for c in self.level_cell_anchors}
        assert len(counts) == 1, f"per-level anchor counts must match, got {counts}"
        self.head = StandardRPNHead(
            num_anchors=self.level_cell_anchors[0].shape[0],
            conv_dim=self.in_channels,
            dtype=self.dtype,
        )
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.matcher = Matcher(self.iou_thresholds, self.iou_labels, allow_low_quality_matches=True)

    def __call__(
        self,
        features: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C)
        image_sizes: jnp.ndarray,  # (B, 2)
        training: bool,
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        compute_losses: bool = True,
    ) -> Tuple[Proposals, Dict[str, jnp.ndarray]]:
        b = features[0].shape[0]
        a = self.level_cell_anchors[0].shape[0]
        pre_k = self.pre_nms_topk_train if training else self.pre_nms_topk_test
        post_k = self.post_nms_topk_train if training else self.post_nms_topk_test

        logits_all, deltas_all, anchors_all = [], [], []
        cand_boxes, cand_scores, cand_levels = [], [], []
        for lvl, (feat, stride, cell) in enumerate(
            zip(features, self.strides, self.level_cell_anchors)
        ):
            h, w = feat.shape[1:3]
            logits_map, deltas_map = self.head(feat)
            logits = logits_map.reshape(b, h * w * a).astype(jnp.float32)
            deltas = deltas_map.reshape(b, h * w * a, 4).astype(jnp.float32)
            anchors = self._grid(h, w, stride, cell)
            logits_all.append(logits)
            deltas_all.append(deltas)
            anchors_all.append(anchors)

            # per-level candidate selection (pre_nms_topk is PER LEVEL in the
            # reference, proposal_utils.py:60-75)
            k_l = min(pre_k, anchors.shape[0])
            lg = jax.lax.stop_gradient(logits)
            dl = jax.lax.stop_gradient(deltas)

            def per_image(logit, delta, hw):
                top_scores, top_idx = jax.lax.top_k(logit, k_l)
                top_boxes = self.box2box.apply_deltas(delta[top_idx], anchors[top_idx])
                top_boxes = box_ops.clip(top_boxes, (hw[0], hw[1]))
                ok = box_ops.nonempty(top_boxes, self.min_box_size)
                ok &= jnp.all(jnp.isfinite(top_boxes), axis=-1) & jnp.isfinite(top_scores)
                return top_boxes, jnp.where(ok, top_scores, -jnp.inf)

            bx, sc = jax.vmap(per_image)(lg, dl, image_sizes)
            cand_boxes.append(bx)
            cand_scores.append(sc)
            cand_levels.append(jnp.full((b, k_l), lvl, jnp.int32))

        losses: Dict[str, jnp.ndarray] = {}
        if training and compute_losses:
            assert gt_boxes is not None and rng is not None
            # anchors of ALL levels matched jointly (reference rpn.py
            # label_and_sample_anchors concatenates the level grids)
            anchors = jnp.concatenate(anchors_all, axis=0)
            logits = jnp.concatenate(logits_all, axis=1)
            deltas = jnp.concatenate(deltas_all, axis=1)
            keys = jax.random.split(rng, b)
            losses = self._losses(anchors, logits, deltas, gt_boxes, gt_valid, keys)

        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        levels = jnp.concatenate(cand_levels, axis=1)

        def nms_per_image(bx, sc, lv, hw):
            # boxes are clipped to the image, so a (max dim + 1) per-level
            # offset makes levels non-overlapping -> one NMS suppresses
            # within levels only, exactly batched_nms semantics
            off = lv.astype(jnp.float32)[:, None] * (jnp.max(hw).astype(jnp.float32) + 1.0)
            idx, valid = nms(bx + off, sc, self.nms_thresh, post_k, valid=sc > -jnp.inf)
            return bx[idx], sc[idx], valid

        pb, ps, pv = jax.vmap(nms_per_image)(boxes, scores, levels, image_sizes)
        return Proposals(boxes=pb, scores=jnp.where(pv, ps, -jnp.inf), valid=pv), losses

    def _grid(self, h: int, w: int, stride: int, cell: np.ndarray) -> jnp.ndarray:
        return anchor_grid(h, w, stride, cell, self.anchor_offset)
