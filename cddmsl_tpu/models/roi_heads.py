"""C4 RoI heads for the CLIP ResNet (TPU-native).

Re-implements the reference CLIPRes5ROIHeads (detectron2/modeling/roi_heads/
clip_roi_heads.py:28-199) and the shared label_and_sample_proposals logic
(roi_heads.py:237-296):
  * proposals (+appended GT, add_ground_truth_to_proposals) are matched to GT
    with an IoU-0.5 matcher, then 512/img are sampled at 0.25 positive
    fraction — here as fixed-capacity index buffers with validity masks
  * pooling is the MXU RoIAlign (ops/roi_align.py) at res4 stride 16, then
    the *backbone's* layer4 (res5) runs on the pooled 14x14 crops and
    AttentionPool2d produces 1024-d region embeddings (clip_roi_heads.py
    _shared_roi_transform :115 + forward :134-176)
  * `forward_get_features` pools the SAME boxes from two feature maps for the
    region-level consistency loss (clip_roi_heads.py:117-132)

res5/attnpool are passed in as callables by the meta-arch (the reference
passes backbone.layer4 / backbone.attnpool the same way).
"""

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_regression import Box2BoxTransform
from ..ops.roi_align import roi_align
from ..structures import boxes as box_ops
from .fast_rcnn import (
    DetectionResult,
    FastRCNNOutputLayers,
    fast_rcnn_inference_single_image,
    fast_rcnn_losses,
)
from .keypoint_head import (
    KeypointROIHeads,
    KRCNNConvDeconvUpsampleHead,
    decode_keypoint_heatmaps,
    keypoint_rcnn_loss,
)
from .mask_head import MaskRCNNConvUpsampleHead, crop_mask_targets, mask_rcnn_inference, mask_rcnn_loss
from .matcher import Matcher
from .rpn import Proposals
from .sampling import gather_selected, subsample_labels


class CLIPRes5ROIHeads(nn.Module):
    num_classes: int = 20
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    iou_thresholds: Sequence[float] = (0.5,)
    iou_labels: Sequence[int] = (0, 1)
    proposal_append_gt: bool = True
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 0
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    use_text_emb: bool = True
    emb_dim: int = 1024
    temperature: float = 0.01
    focal_gamma: Optional[float] = None
    bg_loss_weight: Optional[float] = None
    cls_agnostic_bbox_reg: bool = False
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    only_sample_fg: bool = False
    use_pallas_roi_align: bool = False  # experimental: ops/pallas kernel
    roi_chunk_size: int = 128  # TPU.ROI_CHUNK_SIZE
    # mask branch (reference roi_heads.py:375-401,480-534: box and mask share
    # the pooled res5 features in C4 models)
    mask_on: bool = False
    mask_num_conv: int = 0
    mask_conv_dim: int = 256
    mask_cls_agnostic: bool = False
    mask_canvas_stride: float = 4.0
    # keypoint branch (reference StandardROIHeads _forward_keypoint +
    # keypoint_head.py; enabled by MODEL.KEYPOINT_ON)
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    keypoint_loss_weight: float = 1.0  # ROI_KEYPOINT_HEAD.LOSS_WEIGHT
    # <=0 = normalize by visible count (NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS);
    # >0 = reference's num_keypoints*batch_size_per_image*positive_fraction
    keypoint_loss_normalizer: float = -1.0
    # inference options (reference fast_rcnn.py:466-527, plumbed from
    # MODEL.CLIP.* / MODEL.ROI_HEADS.SOFT_NMS_*)
    no_box_delta: bool = False
    multiply_rpn_score: bool = False
    soft_nms_enabled: bool = False
    soft_nms_method: str = "gaussian"
    soft_nms_sigma: float = 0.5
    soft_nms_prune: float = 0.001
    dtype: Any = jnp.float32

    def setup(self):
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            input_size=self.emb_dim,
            use_text_emb=self.use_text_emb,
            temperature=self.temperature,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            dtype=self.dtype,
        )
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.matcher = Matcher(self.iou_thresholds, self.iou_labels, allow_low_quality_matches=False)
        if self.mask_on:
            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=self.num_classes,
                num_conv=self.mask_num_conv,
                conv_dim=self.mask_conv_dim,
                cls_agnostic=self.mask_cls_agnostic,
                dtype=self.dtype,
            )
        if self.keypoint_on:
            self.keypoint_branch = KeypointROIHeads(
                num_keypoints=self.num_keypoints,
                pooler_resolution=self.pooler_resolution,
                pooler_scale=self.pooler_scale,
                conv_dims=tuple(self.keypoint_conv_dims),
                dtype=self.dtype,
                loss_weight=self.keypoint_loss_weight,
                loss_normalizer=self.keypoint_loss_normalizer,
            )

    # ---------- sampling ----------
    def label_and_sample_proposals(
        self,
        rng: jax.Array,
        proposals: Proposals,
        gt_boxes: jnp.ndarray,  # (B, G, 4)
        gt_classes: jnp.ndarray,  # (B, G)
        gt_valid: jnp.ndarray,  # (B, G)
    ):
        """Returns per-image fixed-size samples:
        boxes (B,S,4), classes (B,S) in [0,K], matched_gt (B,S,4), valid (B,S),
        matched_idx (B,S) — index of the matched GT row (for mask targets)."""
        b = proposals.boxes.shape[0]
        keys = jax.random.split(rng, b)

        def per_image(pboxes, pvalid, gtb, gtc, gtv, key):
            if self.proposal_append_gt:
                pboxes = jnp.concatenate([pboxes, gtb], axis=0)
                pvalid = jnp.concatenate([pvalid, gtv], axis=0)
            iou = box_ops.pairwise_iou(gtb, pboxes)  # (G, P)
            iou = jnp.where(pvalid[None, :], iou, -1.0)
            matched_idxs, match_labels = self.matcher(iou, gtv)
            has_gt = jnp.any(gtv)
            classes = jnp.where(
                match_labels == 1, gtc[matched_idxs], self.num_classes
            )
            classes = jnp.where(match_labels == -1, -1, classes)
            classes = jnp.where(has_gt, classes, self.num_classes)
            classes = jnp.where(pvalid, classes, -1)  # padded proposals ignored

            positive = (classes >= 0) & (classes < self.num_classes)
            negative = classes == self.num_classes
            if self.only_sample_fg:  # MODEL.CLIP.ONLY_SAMPLE_FG_PROPOSALS
                negative = jnp.zeros_like(negative)
            k1, k2 = jax.random.split(key)
            pos_sel, neg_sel = subsample_labels(
                k1, positive, negative, self.batch_size_per_image, self.positive_fraction
            )
            idx, valid = gather_selected(k2, pos_sel, neg_sel, self.batch_size_per_image)
            return (
                pboxes[idx],
                jnp.where(valid, classes[idx], self.num_classes),
                gtb[matched_idxs[idx]],
                valid,
                matched_idxs[idx],
            )

        return jax.vmap(per_image)(
            proposals.boxes, proposals.valid, gt_boxes, gt_classes, gt_valid, keys
        )

    # ---------- pooling ----------
    def pool(self, features: jnp.ndarray, boxes: jnp.ndarray,
             chunk_size: Optional[int] = None) -> jnp.ndarray:
        """features (B,H,W,C), boxes (B,S,4) -> (B*S, P, P, C).

        NOT rematerialized (round-2 change): boxes arrive stop-gradient'd, so
        the backward of the separable matmuls needs only the tiny per-ROI
        interpolation matrices — the (R, P, W, C)-sized intermediate is never
        a residual, and the round-1 jax.checkpoint only bought a full forward
        recompute (~45 ms/step) for nothing."""

        if self.use_pallas_roi_align:
            from ..ops.pallas.roi_align_pallas import roi_align_pallas

            align = lambda fi, bi: roi_align_pallas(
                fi, bi, (self.pooler_resolution, self.pooler_resolution),
                self.pooler_scale, self.pooler_sampling_ratio,
            )
        else:
            align = lambda fi, bi: roi_align(
                fi, bi, (self.pooler_resolution, self.pooler_resolution),
                self.pooler_scale, self.pooler_sampling_ratio, True,
                chunk_size=chunk_size or self.roi_chunk_size,
            )

        def _pool(f, bx):
            return jax.vmap(align)(f, bx)

        pooled = _pool(features, boxes)
        b, s = boxes.shape[:2]
        return pooled.reshape(b * s, self.pooler_resolution, self.pooler_resolution, -1)

    # ---------- forward ----------
    def __call__(
        self,
        features: jnp.ndarray,  # (B, H, W, C) res4
        proposals: Proposals,
        image_sizes: jnp.ndarray,
        training: bool,
        res5_fn: Callable,
        attnpool_fn: Optional[Callable],
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_classes: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        gt_masks: Optional[jnp.ndarray] = None,
        gt_keypoints: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ):
        b = features.shape[0]
        if training:
            boxes, classes, matched_gt, valid, matched_idx = self.label_and_sample_proposals(
                rng, proposals, gt_boxes, gt_classes, gt_valid
            )
            s = boxes.shape[1]
            # box and mask heads share the pooled res5 features
            # (reference roi_heads.py:488-506 Res5ROIHeads.forward)
            r5 = res5_fn(self.pool(features, boxes))  # (B*S, P/2, P/2, C5)
            region_feats = attnpool_fn(r5) if attnpool_fn is not None else jnp.mean(r5, axis=(1, 2))
            scores, deltas = self.box_predictor(region_feats)
            losses = fast_rcnn_losses(
                scores,
                deltas,
                boxes.reshape(b * s, 4),
                matched_gt.reshape(b * s, 4),
                classes.reshape(b * s),
                valid.reshape(b * s),
                self.num_classes,
                self.box2box,
                smooth_l1_beta=self.smooth_l1_beta,
                box_reg_loss_type=self.box_reg_loss_type,
                focal_gamma=self.focal_gamma,
                bg_loss_weight=self.bg_loss_weight,
            )
            if self.mask_on:
                assert gt_masks is not None, "MASK_ON training needs batch.gt_masks"
                mask_logits = self.mask_head(r5)  # (B*S, P, P, K)
                m = mask_logits.shape[1]
                targets = jax.vmap(
                    lambda cv, mi, bx: crop_mask_targets(
                        cv, mi, bx, m, stride=self.mask_canvas_stride
                    )
                )(gt_masks, matched_idx, boxes)  # (B, S, m, m)
                flat_classes = classes.reshape(b * s)
                fg = valid.reshape(b * s) & (flat_classes >= 0) & (flat_classes < self.num_classes)
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits, targets.reshape(b * s, m, m), flat_classes, fg
                )
            if self.keypoint_on:
                assert gt_keypoints is not None, "KEYPOINT_ON training needs batch.gt_keypoints"
                # matched GT keypoints per sampled box (reference
                # roi_heads.py _forward_keypoint trains on fg proposals; here
                # all S are pooled and the loss is masked to fg — identical
                # value, static shapes)
                kp = jax.vmap(lambda g, mi: g[mi])(gt_keypoints, matched_idx)  # (B,S,K,3)
                fg2d = valid & (classes >= 0) & (classes < self.num_classes)
                losses.update(self.keypoint_branch.losses(features, boxes, fg2d, kp))
            return None, losses

        region_feats = self._region_embed(features, proposals.boxes, res5_fn, attnpool_fn)
        scores, deltas = self.box_predictor(region_feats)
        k = proposals.boxes.shape[1]
        scores = scores.reshape(b, k, -1)
        deltas = deltas.reshape(b, k, -1)

        def per_image(sc, dl, pb, pv, ps, hw):
            return fast_rcnn_inference_single_image(
                sc,
                dl,
                pb,
                pv,
                hw,
                self.box2box,
                self.num_classes,
                score_thresh=self.score_thresh_test,
                nms_thresh=self.nms_thresh_test,
                topk_per_image=self.detections_per_image,
                no_box_delta=self.no_box_delta,
                rpn_scores=ps,
                multiply_rpn_score=self.multiply_rpn_score,
                soft_nms_enabled=self.soft_nms_enabled,
                soft_nms_method=self.soft_nms_method,
                soft_nms_sigma=self.soft_nms_sigma,
                soft_nms_prune=self.soft_nms_prune,
            )

        detections = jax.vmap(per_image)(
            scores, deltas, proposals.boxes, proposals.valid, proposals.scores, image_sizes
        )
        if self.mask_on:
            # second shared-transform pass on the FINAL boxes (reference
            # forward_with_given_boxes, roi_heads.py:513-534)
            d = detections.boxes.shape[1]
            r5 = res5_fn(self.pool(features, detections.boxes))
            mask_logits = self.mask_head(r5)  # (B*D, P, P, K)
            m = mask_logits.shape[1]
            probs = mask_rcnn_inference(mask_logits, detections.classes.reshape(b * d))
            detections = detections._replace(masks=probs.reshape(b, d, m, m))
        if self.keypoint_on:
            # decode keypoints on the FINAL boxes (reference
            # forward_with_given_boxes -> heatmaps_to_keypoints)
            kps = self.keypoint_branch.inference(features, detections.boxes)
            detections = detections._replace(keypoints=kps)
        return detections, {}

    def _region_embed(self, features, boxes, res5_fn, attnpool_fn) -> jnp.ndarray:
        """(B,H,W,C) x (B,S,4) -> (B*S, emb) region embeddings via
        pool -> res5 -> attnpool (or mean-pool). Eval-only callers pool in
        LARGER chunks: without a backward pass the (r, PW, H, C) matmul
        intermediate is transient, so fewer sequential lax.map iterations
        cost no extra live HBM (docs/PERF.md round 3)."""
        x = self.pool(features, boxes, chunk_size=max(self.roi_chunk_size, 512))
        x = res5_fn(x)  # (B*S, P/2, P/2, 2048)
        if attnpool_fn is not None:
            return attnpool_fn(x)
        return jnp.mean(x, axis=(1, 2))

    def forward_get_features(
        self, features_src, features_trgt, boxes, res5_fn, attnpool_fn
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pool the SAME boxes from both domains' feature maps
        (reference clip_roi_heads.py:117-132)."""
        f_src = self._region_embed(features_src, boxes, res5_fn, attnpool_fn)
        f_trgt = self._region_embed(features_trgt, boxes, res5_fn, attnpool_fn)
        return f_src, f_trgt


class CLIPStandardROIHeads(nn.Module):
    """FPN-variant RoI heads (reference clip_roi_heads.py:309-578): pool 7x7
    from p2-p5 with level assignment, a 2-FC box head, and the same
    text-embedding classifier. Used with FPN backbones; the CDDMSL recipes
    use the C4 heads above."""

    num_classes: int = 80
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    only_sample_fg: bool = False
    pooler_resolution: int = 7
    pooler_scales: Sequence[float] = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    fc_dim: int = 1024
    use_text_emb: bool = True
    emb_dim: int = 1024
    temperature: float = 0.01
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    # FPN mask branch (reference StandardROIHeads mask pooler 14^2 from
    # p2-p5 + MaskRCNNConvUpsampleHead NUM_CONV=4)
    mask_on: bool = False
    mask_pooler_resolution: int = 14
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_conv_norm: str = ""  # ROI_MASK_HEAD.NORM
    mask_canvas_stride: float = 4.0
    smooth_l1_beta: float = 0.0  # ROI_BOX_HEAD.SMOOTH_L1_BETA (0 = L1)
    # FPN keypoint branch (reference StandardROIHeads _forward_keypoint with
    # a 14^2 p2-p5 pooler + KRCNNConvDeconvUpsampleHead; MODEL.KEYPOINT_ON)
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    keypoint_loss_weight: float = 1.0  # ROI_KEYPOINT_HEAD.LOSS_WEIGHT
    # <=0 = normalize by visible count (NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS);
    # >0 = reference's num_keypoints*batch_size_per_image*positive_fraction
    keypoint_loss_normalizer: float = -1.0
    keypoint_pooler_resolution: int = 14
    # FastRCNNConvFCHead generalization (reference roi_heads/box_head.py):
    # NUM_CONV 3x3 convs (+optional GN) on the pooled map, then NUM_FC fcs.
    # num_fc=2 keeps the legacy fc1(fc_dim)+fc2(emb_dim) naming; num_fc=1 is
    # the GN-config shape (conv4 + one fc, predictor reads fc_dim).
    box_num_conv: int = 0
    box_conv_dim: int = 256
    box_num_fc: int = 2
    box_conv_norm: str = ""  # ROI_BOX_HEAD.NORM ("" or "GN")
    box_reg_loss_type: str = "smooth_l1"  # or "giou" (the _giou zoo config)
    box_reg_loss_weight: float = 1.0  # ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT
    cls_agnostic_bbox_reg: bool = False
    mask_cls_agnostic: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        from .poolers import ROIPooler

        self.pooler = ROIPooler(
            self.pooler_resolution, self.pooler_scales, sampling_ratio=0, min_level=2
        )
        if self.mask_on:
            self.mask_pooler = ROIPooler(
                self.mask_pooler_resolution, self.pooler_scales, sampling_ratio=0, min_level=2
            )
            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=self.num_classes,
                num_conv=self.mask_num_conv,
                conv_dim=self.mask_conv_dim,
                conv_norm=self.mask_conv_norm,
                cls_agnostic=self.mask_cls_agnostic,
                dtype=self.dtype,
            )
        if self.keypoint_on:
            self.kp_pooler = ROIPooler(
                self.keypoint_pooler_resolution, self.pooler_scales, sampling_ratio=0, min_level=2
            )
            self.kp_head = KRCNNConvDeconvUpsampleHead(
                num_keypoints=self.num_keypoints,
                conv_dims=tuple(self.keypoint_conv_dims),
                dtype=self.dtype,
            )
        if self.box_num_conv > 0:
            from .backbone.batch_norm import GroupNorm32, SyncBatchNorm

            self.box_head_convs = [
                nn.Conv(
                    self.box_conv_dim, (3, 3), padding=1,
                    use_bias=(self.box_conv_norm == ""),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"box_head_conv{i + 1}",
                )
                for i in range(self.box_num_conv)
            ]

            def _head_norm(i):
                if self.box_conv_norm == "GN":
                    return GroupNorm32(
                        self.box_conv_dim, dtype=self.dtype, name=f"box_head_conv{i + 1}_gn"
                    )
                if self.box_conv_norm == "SyncBN":
                    # batch axis = all sampled regions across the global batch
                    # (reference FastRCNNConvFCHead with get_norm("SyncBN"))
                    return SyncBatchNorm(
                        self.box_conv_dim, axis_name=None, dtype=self.dtype,
                        name=f"box_head_conv{i + 1}_bn",
                    )
                return None

            self.box_head_conv_norms = [_head_norm(i) for i in range(self.box_num_conv)]
        assert self.box_num_fc in (1, 2), "ROI_BOX_HEAD.NUM_FC must be 1 or 2"
        self.box_head_fc1 = nn.Dense(self.fc_dim, dtype=self.dtype, param_dtype=jnp.float32)
        if self.box_num_fc == 2:
            self.box_head_fc2 = nn.Dense(self.emb_dim, dtype=self.dtype, param_dtype=jnp.float32)
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            input_size=self.emb_dim if self.box_num_fc == 2 else self.fc_dim,
            use_text_emb=self.use_text_emb,
            temperature=self.temperature,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            dtype=self.dtype,
        )
        self.box2box = Box2BoxTransform((10.0, 10.0, 5.0, 5.0))
        self.matcher = Matcher((0.5,), (0, 1), allow_low_quality_matches=False)

    def _box_features(self, fpn_feats, boxes):
        """fpn_feats: list of (B, H_l, W_l, C); boxes (B, S, 4) -> (B*S, D)."""
        b, s = boxes.shape[:2]
        pooled = jax.vmap(lambda *per_img: self.pooler(list(per_img[:-1]), per_img[-1]))(
            *fpn_feats, boxes
        )
        if self.box_num_conv > 0:
            r = self.pooler_resolution
            x = pooled.reshape(b * s, r, r, -1).astype(self.dtype)
            for conv, norm in zip(self.box_head_convs, self.box_head_conv_norms):
                x = conv(x)
                if norm is not None:
                    x = norm(x)
                x = nn.relu(x)
            x = x.reshape(b * s, -1)
        else:
            x = pooled.reshape(b * s, -1)
        x = nn.relu(self.box_head_fc1(x.astype(self.dtype)))
        if self.box_num_fc == 2:
            x = nn.relu(self.box_head_fc2(x))
        return x

    def _mask_pool(self, fpn_feats, boxes):
        b, s = boxes.shape[:2]
        pooled = jax.vmap(lambda *per_img: self.mask_pooler(list(per_img[:-1]), per_img[-1]))(
            *fpn_feats, boxes
        )
        return pooled.reshape(b * s, self.mask_pooler_resolution, self.mask_pooler_resolution, -1)

    def _kp_pool(self, fpn_feats, boxes):
        b, s = boxes.shape[:2]
        pooled = jax.vmap(lambda *per_img: self.kp_pooler(list(per_img[:-1]), per_img[-1]))(
            *fpn_feats, boxes
        )
        r = self.keypoint_pooler_resolution
        return pooled.reshape(b * s, r, r, -1)

    def __call__(self, fpn_feats, proposals: Proposals, image_sizes, training: bool,
                 gt_boxes=None, gt_classes=None, gt_valid=None, gt_masks=None,
                 gt_keypoints=None, rng=None):
        if training:
            boxes, classes, matched_gt, valid, matched_idx = CLIPRes5ROIHeads.label_and_sample_proposals(
                self, rng, proposals, gt_boxes, gt_classes, gt_valid
            )
            feats = self._box_features(fpn_feats, boxes)
            scores, deltas = self.box_predictor(feats)
            b, s = boxes.shape[:2]
            losses = fast_rcnn_losses(
                scores, deltas, boxes.reshape(b * s, 4), matched_gt.reshape(b * s, 4),
                classes.reshape(b * s), valid.reshape(b * s),
                self.num_classes, self.box2box,
                smooth_l1_beta=self.smooth_l1_beta,
                box_reg_loss_type=self.box_reg_loss_type,
                box_reg_loss_weight=self.box_reg_loss_weight,
            )
            if self.mask_on:
                assert gt_masks is not None, "MASK_ON training needs gt_masks"
                mask_logits = self.mask_head(self._mask_pool(fpn_feats, boxes))
                m = mask_logits.shape[1]
                targets = jax.vmap(
                    lambda cv, mi, bx: crop_mask_targets(cv, mi, bx, m, stride=self.mask_canvas_stride)
                )(gt_masks, matched_idx, boxes)
                flat_classes = classes.reshape(b * s)
                fg = valid.reshape(b * s) & (flat_classes >= 0) & (flat_classes < self.num_classes)
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits, targets.reshape(b * s, m, m), flat_classes, fg
                )
            if self.keypoint_on:
                assert gt_keypoints is not None, "KEYPOINT_ON training needs gt_keypoints"
                kp = jax.vmap(lambda g, mi: g[mi])(gt_keypoints, matched_idx)  # (B,S,K,3)
                heat = self.kp_head(self._kp_pool(fpn_feats, boxes))
                size = heat.shape[1]
                pos, vis = KeypointROIHeads.keypoints_to_heatmap_targets(
                    kp.reshape(b * s, self.num_keypoints, 3), boxes.reshape(b * s, 4), size
                )
                flat_classes = classes.reshape(b * s)
                fg = valid.reshape(b * s) & (flat_classes >= 0) & (flat_classes < self.num_classes)
                knorm = (
                    None if self.keypoint_loss_normalizer <= 0
                    else b * self.keypoint_loss_normalizer
                )
                losses["loss_keypoint"] = self.keypoint_loss_weight * keypoint_rcnn_loss(
                    heat, pos, vis & fg[:, None], knorm
                )
            return None, losses
        feats = self._box_features(fpn_feats, proposals.boxes)
        b, k = proposals.boxes.shape[:2]
        scores_d, deltas_d = self.box_predictor(feats)
        scores = scores_d.reshape(b, k, -1)
        deltas = deltas_d.reshape(b, k, -1)

        def per_image(sc, dl, pb, pv, hw):
            return fast_rcnn_inference_single_image(
                sc, dl, pb, pv, hw, self.box2box, self.num_classes,
                score_thresh=self.score_thresh_test,
                nms_thresh=self.nms_thresh_test,
                topk_per_image=self.detections_per_image,
            )

        detections = jax.vmap(per_image)(scores, deltas, proposals.boxes, proposals.valid, image_sizes)
        if self.mask_on:
            d = detections.boxes.shape[1]
            mask_logits = self.mask_head(self._mask_pool(fpn_feats, detections.boxes))
            m = mask_logits.shape[1]
            probs = mask_rcnn_inference(mask_logits, detections.classes.reshape(b * d))
            detections = detections._replace(masks=probs.reshape(b, d, m, m))
        if self.keypoint_on:
            heat = self.kp_head(self._kp_pool(fpn_feats, detections.boxes))
            detections = detections._replace(
                keypoints=decode_keypoint_heatmaps(heat, detections.boxes)
            )
        return detections, {}
