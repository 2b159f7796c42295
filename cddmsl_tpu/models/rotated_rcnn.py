"""Rotated detection family, TPU-native.

Re-implements the reference rotated stack:
  * RRPN (detectron2/modeling/proposal_generator/rrpn.py:203): RPN over
    5-param (cx, cy, w, h, angle) anchors, rotated-IoU matching, rotated NMS
  * RROIHeads / RotatedFastRCNNOutputLayers
    (detectron2/modeling/roi_heads/rotated_fast_rcnn.py:270): RoIAlignRotated
    pooling, 2-FC box head, 5-d class-specific deltas, per-class rotated NMS
  * `RotatedFastRCNN` meta-arch assembling both over a d2-ResNet backbone.

All shapes static (padded anchors/proposals/GT with validity masks); the
rotated geometry kernels live in ops/rotated.py (Sutherland–Hodgman polygon
clipping IoU, fixpoint rotated NMS, rotated bilinear RoIAlign).
"""

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.box_regression import Box2BoxTransformRotated
from ..ops.rotated import nms_rotated, pairwise_iou_rotated, roi_align_rotated
from .matcher import Matcher
from .rpn import StandardRPNHead, smooth_l1
from .sampling import gather_selected, subsample_labels


class RotatedProposals(NamedTuple):
    boxes: jnp.ndarray  # (B, K, 5) XYWHA
    scores: jnp.ndarray  # (B, K)
    valid: jnp.ndarray  # (B, K)


class RotatedDetBatch(NamedTuple):
    image: jnp.ndarray  # (B, H, W, 3)
    image_sizes: jnp.ndarray  # (B, 2)
    gt_boxes: jnp.ndarray  # (B, G, 5) XYWHA degrees
    gt_classes: jnp.ndarray  # (B, G)
    gt_valid: jnp.ndarray  # (B, G)


def rotated_anchor_grid(
    h: int,
    w: int,
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float],
    angles: Sequence[float],
) -> np.ndarray:
    """(H*W*A, 5) rotated anchors (reference anchor_generator.py
    RotatedAnchorGenerator: sizes x ratios x angles at every grid center)."""
    cell = []
    for size in sizes:
        area = size ** 2
        for ar in aspect_ratios:
            cw = np.sqrt(area / ar)
            ch = ar * cw
            for a in angles:
                cell.append([0.0, 0.0, cw, ch, a])
    cell = np.asarray(cell, np.float32)  # (A, 5)
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)
    centers = np.stack([cx.ravel(), cy.ravel()], axis=1)  # (HW, 2)
    out = np.zeros((len(centers), len(cell), 5), np.float32)
    out[:, :, :2] = centers[:, None, :]
    out[:, :, 2:] = cell[None, :, 2:]
    return out.reshape(-1, 5)


class RRPN(nn.Module):
    """reference rrpn.py:203 (single level)."""

    in_channels: int
    stride: int = 16
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_angles: Sequence[float] = (-90.0, -30.0, 30.0, 90.0)
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk: int = 512
    post_nms_topk: int = 128
    nms_thresh: float = 0.7
    smooth_l1_beta: float = 0.0
    loss_weight: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        a = len(self.anchor_sizes) * len(self.anchor_aspect_ratios) * len(self.anchor_angles)
        self.head = StandardRPNHead(num_anchors=a, conv_dim=self.in_channels, box_dim=5, dtype=self.dtype)
        self.box2box = Box2BoxTransformRotated((1.0, 1.0, 1.0, 1.0, 1.0))
        self.matcher = Matcher(self.iou_thresholds, self.iou_labels, allow_low_quality_matches=True)

    def __call__(
        self,
        features: jnp.ndarray,
        image_sizes: jnp.ndarray,
        training: bool,
        gt_boxes: Optional[jnp.ndarray] = None,  # (B, G, 5)
        gt_valid: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[RotatedProposals, Dict[str, jnp.ndarray]]:
        b, h, w, _ = features.shape
        a = len(self.anchor_sizes) * len(self.anchor_aspect_ratios) * len(self.anchor_angles)
        logits_map, deltas_map = self.head(features)
        logits = logits_map.reshape(b, h * w * a).astype(jnp.float32)
        deltas = deltas_map.reshape(b, h * w * a, 5).astype(jnp.float32)
        anchors = jnp.asarray(
            rotated_anchor_grid(
                h, w, self.stride, self.anchor_sizes, self.anchor_aspect_ratios, self.anchor_angles
            )
        )

        losses: Dict[str, jnp.ndarray] = {}
        if training and gt_boxes is not None:
            keys = jax.random.split(rng, b)

            def per_image(logit, delta, gtb, gtv, key):
                iou = pairwise_iou_rotated(gtb, anchors)  # (G, A)
                iou = jnp.where(gtv[:, None], iou, -1.0)
                matched_idxs, match_labels = self.matcher(iou, gtv)
                pos_sel, neg_sel = subsample_labels(
                    key, match_labels == 1, match_labels == 0,
                    self.batch_size_per_image, self.positive_fraction,
                )
                gt_deltas = self.box2box.get_deltas(anchors, gtb[matched_idxs])
                loc = jnp.sum(smooth_l1(delta, gt_deltas, self.smooth_l1_beta) * pos_sel[:, None])
                sampled = pos_sel | neg_sel
                t = pos_sel.astype(jnp.float32)
                bce = jnp.maximum(logit, 0) - logit * t + jnp.log1p(jnp.exp(-jnp.abs(logit)))
                return loc, jnp.sum(bce * sampled)

            loc, cls = jax.vmap(per_image)(logits, deltas, gt_boxes, gt_valid, keys)
            norm = self.batch_size_per_image * b
            losses = {
                "loss_rpn_cls": jnp.sum(cls) / norm * self.loss_weight,
                "loss_rpn_loc": jnp.sum(loc) / norm * self.loss_weight,
            }

        pre_k = min(self.pre_nms_topk, anchors.shape[0])
        lg = jax.lax.stop_gradient(logits)
        dl = jax.lax.stop_gradient(deltas)

        def propose(logit, delta):
            top_scores, top_idx = jax.lax.top_k(logit, pre_k)
            top_boxes = self.box2box.apply_deltas(delta[top_idx], anchors[top_idx])
            ok = jnp.all(jnp.isfinite(top_boxes), axis=-1) & jnp.isfinite(top_scores)
            idx, valid = nms_rotated(top_boxes, top_scores, self.nms_thresh, self.post_nms_topk, valid=ok)
            return top_boxes[idx], top_scores[idx], valid

        boxes, scores, valid = jax.vmap(propose)(lg, dl)
        return RotatedProposals(boxes, jnp.where(valid, scores, -jnp.inf), valid), losses


class RotatedDetectionResult(NamedTuple):
    boxes: jnp.ndarray  # (D, 5)
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


class RROIHeads(nn.Module):
    """reference rotated_fast_rcnn.py:270 RROIHeads + RotatedFastRCNNOutputLayers."""

    num_classes: int = 8
    in_channels: int = 1024
    batch_size_per_image: int = 64
    positive_fraction: float = 0.25
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16
    fc_dim: int = 256
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 32
    max_candidates: int = 256
    dtype: Any = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32)
        self.fc2 = nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32)
        self.cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=jnp.float32)
        self.bbox_pred = nn.Dense(self.num_classes * 5, dtype=self.dtype, param_dtype=jnp.float32)
        self.box2box = Box2BoxTransformRotated((10.0, 10.0, 5.0, 5.0, 1.0))
        self.matcher = Matcher((0.5,), (0, 1), allow_low_quality_matches=False)

    def _box_feats(self, features, boxes):
        b, s = boxes.shape[:2]
        pooled = jax.vmap(
            lambda f, bx: roi_align_rotated(
                f, bx, (self.pooler_resolution, self.pooler_resolution), self.pooler_scale
            )
        )(features, boxes)
        x = pooled.reshape(b * s, -1).astype(self.dtype)
        x = nn.relu(self.fc1(x))
        return nn.relu(self.fc2(x))

    def __call__(self, features, proposals: RotatedProposals, training: bool,
                 gt_boxes=None, gt_classes=None, gt_valid=None, rng=None):
        b = features.shape[0]
        if training:
            keys = jax.random.split(rng, b)

            def sample(pboxes, pvalid, gtb, gtc, gtv, key):
                pboxes = jnp.concatenate([pboxes, gtb], axis=0)
                pvalid = jnp.concatenate([pvalid, gtv], axis=0)
                iou = pairwise_iou_rotated(gtb, pboxes)
                iou = jnp.where(pvalid[None, :], jnp.where(gtv[:, None], iou, -1.0), -1.0)
                matched_idxs, match_labels = self.matcher(iou, gtv)
                classes = jnp.where(match_labels == 1, gtc[matched_idxs], self.num_classes)
                classes = jnp.where(pvalid, classes, -1)
                pos = (classes >= 0) & (classes < self.num_classes)
                neg = classes == self.num_classes
                k1, k2 = jax.random.split(key)
                pos_sel, neg_sel = subsample_labels(
                    k1, pos, neg, self.batch_size_per_image, self.positive_fraction
                )
                idx, valid = gather_selected(k2, pos_sel, neg_sel, self.batch_size_per_image)
                return pboxes[idx], jnp.where(valid, classes[idx], self.num_classes), gtb[matched_idxs[idx]], valid

            boxes, classes, matched_gt, valid = jax.vmap(sample)(
                proposals.boxes, proposals.valid, gt_boxes, gt_classes, gt_valid, keys
            )
            s = boxes.shape[1]
            x = self._box_feats(features, boxes)
            scores = self.cls_score(x).astype(jnp.float32)
            deltas = self.bbox_pred(x).astype(jnp.float32)
            flat_cls = classes.reshape(b * s)
            flat_valid = valid.reshape(b * s)
            n_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)
            safe = jnp.where(flat_valid, flat_cls, self.num_classes)
            ce = -jnp.take_along_axis(jax.nn.log_softmax(scores, -1), safe[:, None], 1)[:, 0]
            loss_cls = jnp.sum(ce * flat_valid) / n_valid
            fg = flat_valid & (flat_cls < self.num_classes)
            d = deltas.reshape(b * s, self.num_classes, 5)
            sel = jnp.take_along_axis(d, jnp.clip(flat_cls, 0, self.num_classes - 1)[:, None, None], 1)[:, 0]
            gt_deltas = self.box2box.get_deltas(boxes.reshape(b * s, 5), matched_gt.reshape(b * s, 5))
            reg = jnp.sum(smooth_l1(sel, gt_deltas, 0.0), axis=1)
            loss_box = jnp.sum(reg * fg) / n_valid
            return None, {"loss_cls": loss_cls, "loss_box_reg": loss_box}

        k = proposals.boxes.shape[1]
        x = self._box_feats(features, proposals.boxes)
        scores = jax.nn.softmax(self.cls_score(x).astype(jnp.float32), -1)[:, :-1].reshape(b, k, -1)
        deltas = self.bbox_pred(x).astype(jnp.float32).reshape(b, k, self.num_classes, 5)

        def infer(sc, dl, pb, pv):
            boxes_all = jax.vmap(self.box2box.apply_deltas, in_axes=(1, None), out_axes=1)(
                dl, pb
            )  # (K, C, 5)
            cand = (sc > self.score_thresh_test) & pv[:, None]
            flat_scores = jnp.where(cand, sc, 0.0).reshape(-1)
            flat_boxes = boxes_all.reshape(-1, 5)
            flat_classes = jnp.broadcast_to(jnp.arange(self.num_classes)[None], (k, self.num_classes)).reshape(-1)
            m = min(self.max_candidates, flat_scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(flat_scores, m)
            tb, tc = flat_boxes[top_idx], flat_classes[top_idx]
            tv = top_scores > self.score_thresh_test
            # class-aware rotated NMS via the center-offset trick
            off = tc.astype(tb.dtype) * 10000.0
            tb_off = tb.at[:, 0].add(off)
            idx, valid = nms_rotated(tb_off, top_scores, self.nms_thresh_test,
                                     self.detections_per_image, valid=tv)
            return RotatedDetectionResult(
                boxes=tb[idx], scores=jnp.where(valid, top_scores[idx], 0.0),
                classes=tc[idx].astype(jnp.int32), valid=valid,
            )

        return jax.vmap(infer)(scores, deltas, proposals.boxes, proposals.valid), {}


class RotatedFastRCNN(nn.Module):
    """Rotated Faster R-CNN meta-arch (the RRPN + RROIHeads assembly the
    reference reaches via ROI_HEADS.NAME='RROIHeads' +
    PROPOSAL_GENERATOR.NAME='RRPN')."""

    num_classes: int = 8
    depth: int = 10
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        from .backbone.resnet import D2ResNet

        self.backbone = D2ResNet(depth=self.depth, out_features=("res4",), dtype=self.dtype)
        ch = self.backbone.res2_out_channels * 4  # res4 channels
        self.proposal_generator = RRPN(in_channels=ch, dtype=self.dtype)
        self.roi_heads = RROIHeads(num_classes=self.num_classes, in_channels=ch, dtype=self.dtype)

    def _norm(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.dtype)

    def __call__(self, batch: RotatedDetBatch, rng: jax.Array):
        f = self.backbone(self._norm(batch.image))["res4"]
        k1, k2 = jax.random.split(rng)
        proposals, rpn_losses = self.proposal_generator(
            f, batch.image_sizes, True, batch.gt_boxes, batch.gt_valid, k1
        )
        _, det_losses = self.roi_heads(
            f, proposals, True, batch.gt_boxes, batch.gt_classes, batch.gt_valid, k2
        )
        return {**rpn_losses, **det_losses}

    def inference(self, batch: RotatedDetBatch):
        f = self.backbone(self._norm(batch.image))["res4"]
        proposals, _ = self.proposal_generator(f, batch.image_sizes, False)
        det, _ = self.roi_heads(f, proposals, False)
        return det
