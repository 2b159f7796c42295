"""Cascade R-CNN RoI heads (reference detectron2/modeling/roi_heads/
cascade_rcnn.py:298 CascadeROIHeads): K refinement stages with increasing
IoU-matching thresholds; each stage has its own 2-FC box head and a
CLASS-AGNOSTIC box predictor; stage k+1 is trained on the boxes decoded by
stage k (in-graph, no stop_gradient on the boxes per the reference's
`create_proposals_from_boxes` with detached tensors -> here stop_gradient);
at inference the class scores of all stages are AVERAGED and applied to the
final stage's boxes.

Static shapes: every stage keeps the fixed proposal capacity; matching is
recomputed per stage with the stage's IoU threshold.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_regression import Box2BoxTransform
from ..ops.roi_align import roi_align
from ..structures import boxes as box_ops
from .fast_rcnn import DetectionResult, fast_rcnn_inference_single_image
from .matcher import Matcher
from .rpn import RPN, Proposals, smooth_l1
from .sampling import gather_selected, subsample_labels


class _StageHead(nn.Module):
    """2-FC box head + linear predictors (class-agnostic deltas)."""

    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = pooled.reshape(pooled.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=jnp.float32,
                          name="cls_score")(x).astype(jnp.float32)
        deltas = nn.Dense(4, kernel_init=nn.initializers.normal(0.001), dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x).astype(jnp.float32)
        return scores, deltas


class CascadeROIHeads(nn.Module):
    num_classes: int = 20
    in_channels: int = 1024
    pooler_resolution: int = 7
    # one scale = C4-style single level; multiple = FPN p2..p5 with
    # canonical level assignment (reference cascade heads run on either)
    pooler_scales: Sequence[float] = (1.0 / 16,)
    batch_size_per_image: int = 128
    positive_fraction: float = 0.25
    stage_ious: Sequence[float] = (0.5, 0.6, 0.7)
    stage_weights: Sequence[Sequence[float]] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    # mask branch (reference cascade_mask_rcnn_*: CascadeROIHeads inherits
    # StandardROIHeads' mask head — trained on the stage-0 sampled boxes,
    # applied to the final detections at inference)
    mask_on: bool = False
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_pooler_resolution: int = 14
    mask_canvas_stride: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        self.heads = [
            _StageHead(self.num_classes, dtype=self.dtype, name=f"stage{i}")
            for i in range(len(self.stage_ious))
        ]
        self.box2box = [Box2BoxTransform(w) for w in self.stage_weights]
        self.matchers = [Matcher((t,), (0, 1), allow_low_quality_matches=False) for t in self.stage_ious]
        from .poolers import ROIPooler

        self.pooler = ROIPooler(
            self.pooler_resolution, tuple(self.pooler_scales), sampling_ratio=2, min_level=2
        )
        if self.mask_on:
            from .mask_head import MaskRCNNConvUpsampleHead

            self.mask_pooler = ROIPooler(
                self.mask_pooler_resolution, tuple(self.pooler_scales), sampling_ratio=2,
                min_level=2,
            )
            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=self.num_classes, num_conv=self.mask_num_conv,
                conv_dim=self.mask_conv_dim, dtype=self.dtype,
            )

    def _pool(self, features, boxes, pooler=None):
        """features: list of (B, H_l, W_l, C) maps (single-entry = C4)."""
        if not isinstance(features, (list, tuple)):
            features = [features]
        pooler = pooler or self.pooler
        b, s = boxes.shape[:2]
        pooled = jax.vmap(lambda *per_img: pooler(list(per_img[:-1]), per_img[-1]))(
            *features, boxes
        )
        return pooled.reshape((b * s,) + pooled.shape[2:])

    def _match_and_label(self, stage: int, boxes, valid, gt_boxes, gt_classes, gt_valid):
        """Per-stage matching (NO resampling after stage 0, matching the
        reference: later stages relabel the same proposals)."""

        def per_image(pb, pv, gtb, gtc, gtv):
            iou = box_ops.pairwise_iou(gtb, pb)
            iou = jnp.where(pv[None, :], jnp.where(gtv[:, None], iou, -1.0), -1.0)
            matched_idxs, match_labels = self.matchers[stage](iou, gtv)
            classes = jnp.where(match_labels == 1, gtc[matched_idxs], self.num_classes)
            classes = jnp.where(pv, classes, -1)
            return classes, gtb[matched_idxs]

        return jax.vmap(per_image)(boxes, valid, gt_boxes, gt_classes, gt_valid)

    def __call__(self, features, proposals: Proposals, image_sizes, training: bool,
                 gt_boxes=None, gt_classes=None, gt_valid=None, gt_masks=None,
                 gt_keypoints=None, rng=None):
        assert gt_keypoints is None, "CascadeROIHeads has no keypoint branch"
        b = proposals.boxes.shape[0]
        if training:
            # stage-0 sampling (reference samples once, then cascades)
            keys = jax.random.split(rng, b)

            def sample(pb, pv, gtb, gtc, gtv, key):
                pb = jnp.concatenate([pb, gtb], 0)
                pv = jnp.concatenate([pv, gtv], 0)
                iou = box_ops.pairwise_iou(gtb, pb)
                iou = jnp.where(pv[None, :], jnp.where(gtv[:, None], iou, -1.0), -1.0)
                matched_idxs, match_labels = self.matchers[0](iou, gtv)
                classes = jnp.where(match_labels == 1, gtc[matched_idxs], self.num_classes)
                classes = jnp.where(pv, classes, -1)
                pos = (classes >= 0) & (classes < self.num_classes)
                neg = classes == self.num_classes
                k1, k2 = jax.random.split(key)
                ps, ns = subsample_labels(k1, pos, neg, self.batch_size_per_image, self.positive_fraction)
                idx, valid = gather_selected(k2, ps, ns, self.batch_size_per_image)
                return pb[idx], valid, jnp.where(valid, classes[idx], self.num_classes), matched_idxs[idx]

            boxes, valid, cls0, midx0 = jax.vmap(sample)(
                proposals.boxes, proposals.valid, gt_boxes, gt_classes, gt_valid, keys
            )
            sampled_boxes = boxes  # mask branch trains on the stage-0 samples
            losses: Dict[str, jnp.ndarray] = {}
            s = boxes.shape[1]
            for i, head in enumerate(self.heads):
                classes, matched_gt = self._match_and_label(i, boxes, valid, gt_boxes, gt_classes, gt_valid)
                scores, deltas = head(self._pool(features, boxes))
                flat_cls = classes.reshape(b * s)
                flat_valid = valid.reshape(b * s) & (flat_cls >= 0)
                n_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)
                safe = jnp.where(flat_valid, flat_cls, self.num_classes)
                ce = -jnp.take_along_axis(jax.nn.log_softmax(scores, -1), safe[:, None], 1)[:, 0]
                losses[f"loss_cls_stage{i}"] = jnp.sum(ce * flat_valid) / n_valid
                fg = flat_valid & (flat_cls < self.num_classes)
                gt_deltas = self.box2box[i].get_deltas(
                    boxes.reshape(b * s, 4), matched_gt.reshape(b * s, 4)
                )
                reg = jnp.sum(smooth_l1(deltas, gt_deltas, 0.0), axis=1)
                losses[f"loss_box_reg_stage{i}"] = jnp.sum(reg * fg) / n_valid
                # refine for the next stage
                if i + 1 < len(self.heads):
                    new = self.box2box[i].apply_deltas(jax.lax.stop_gradient(deltas), boxes.reshape(b * s, 4))
                    boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(
                        new.reshape(b, s, 4), image_sizes
                    )
            if self.mask_on:
                assert gt_masks is not None, "mask_on cascade training needs gt_masks"
                from .mask_head import crop_mask_targets, mask_rcnn_loss

                mask_logits = self.mask_head(
                    self._pool(features, sampled_boxes, self.mask_pooler)
                )
                m = mask_logits.shape[1]
                targets = jax.vmap(
                    lambda cv, mi, bx: crop_mask_targets(
                        cv, mi, bx, m, stride=self.mask_canvas_stride
                    )
                )(gt_masks, midx0, sampled_boxes)
                flat_cls = cls0.reshape(b * s)
                fg = valid.reshape(b * s) & (flat_cls >= 0) & (flat_cls < self.num_classes)
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits, targets.reshape(b * s, m, m), flat_cls, fg
                )
            return None, losses

        # inference: run all stages, average class scores, decode final boxes
        boxes = proposals.boxes
        valid = proposals.valid
        k = boxes.shape[1]
        all_scores = []
        deltas = None
        for i, head in enumerate(self.heads):
            scores, deltas = head(self._pool(features, boxes))
            all_scores.append(jax.nn.softmax(scores, -1))
            if i + 1 < len(self.heads):
                new = self.box2box[i].apply_deltas(deltas, boxes.reshape(b * k, 4))
                boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(
                    new.reshape(b, k, 4), image_sizes
                )
        mean_probs = jnp.mean(jnp.stack(all_scores), axis=0).reshape(b, k, -1)
        # feed logits-compatible values: inference_single_image softmaxes, so
        # pass log-probs (softmax(log p) == p renormalized == p)
        mean_logits = jnp.log(jnp.maximum(mean_probs, 1e-12))
        deltas = deltas.reshape(b, k, 4)

        def per_image(sc, dl, pb, pv, hw):
            return fast_rcnn_inference_single_image(
                sc, dl, pb, pv, hw, self.box2box[-1], self.num_classes,
                score_thresh=self.score_thresh_test, nms_thresh=self.nms_thresh_test,
                topk_per_image=self.detections_per_image,
            )

        detections = jax.vmap(per_image)(mean_logits, deltas, boxes, valid, image_sizes)
        if self.mask_on:
            from .mask_head import mask_rcnn_inference

            d = detections.boxes.shape[1]
            mask_logits = self.mask_head(
                self._pool(features, detections.boxes, self.mask_pooler)
            )
            m = mask_logits.shape[1]
            probs = mask_rcnn_inference(mask_logits, detections.classes.reshape(b * d))
            detections = detections._replace(masks=probs.reshape(b, d, m, m))
        return detections, {}


class CascadeRCNN(nn.Module):
    """Cascade R-CNN meta-arch assembly (the reference reaches cascade via
    GeneralizedRCNN + ROI_HEADS.NAME='CascadeROIHeads', configs/
    Misc/cascade_*; here an explicit backbone + RPN + CascadeROIHeads
    module so it is config-constructible)."""

    num_classes: int = 80
    depth: int = 50
    in_channels: int = 1024  # res4 width (256 for basic-block depths 18/34)
    stage_ious: Sequence[float] = (0.5, 0.6, 0.7)
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        from .backbone.resnet import D2ResNet

        self.backbone = D2ResNet(depth=self.depth, out_features=("res4",), dtype=self.dtype)
        ch = self.in_channels
        self.proposal_generator = RPN(in_channels=ch, stride=16, dtype=self.dtype)
        self.roi_heads = CascadeROIHeads(
            num_classes=self.num_classes, in_channels=ch,
            stage_ious=tuple(self.stage_ious), dtype=self.dtype,
        )

    def _norm(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.dtype)

    def losses(self, batch, rng: jax.Array):
        f = self.backbone(self._norm(batch.image))["res4"]
        k1, k2 = jax.random.split(rng)
        proposals, rpn_losses = self.proposal_generator(
            f, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=k1,
        )
        _, det_losses = self.roi_heads(
            f, proposals, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid, rng=k2,
        )
        return {**det_losses, **rpn_losses}

    def inference(self, batch):
        f = self.backbone(self._norm(batch.image))["res4"]
        proposals, _ = self.proposal_generator(f, batch.image_sizes, training=False)
        det, _ = self.roi_heads(f, proposals, batch.image_sizes, training=False)
        # detector_postprocess: rescale to the original image size
        scale = (batch.orig_sizes / jnp.maximum(batch.image_sizes, 1)).astype(jnp.float32)
        sxy = jnp.stack([scale[:, 1], scale[:, 0], scale[:, 1], scale[:, 0]], axis=-1)
        boxes = det.boxes * sxy[:, None, :]
        boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(boxes, batch.orig_sizes)
        return det._replace(boxes=boxes)

    def __call__(self, batch, rng: jax.Array):
        return self.losses(batch, rng)

    init_all = __call__

    def cddmsl_losses(self, batch, rng: jax.Array, caption_on=None,
                      kd_regularization: bool = True, enable_caption: bool = True):
        """Trainer protocol (engine/train_loop.py make_train_step)."""
        del caption_on, kd_regularization, enable_caption
        return self.losses(batch, rng)
