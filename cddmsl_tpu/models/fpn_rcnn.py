"""FPN-based Faster/Mask R-CNN meta-architecture (the reference's most-used
config family: configs/Base-RCNN-FPN.yaml -> GeneralizedRCNN with
build_resnet_fpn_backbone, multi-level RPN over p2..p6
(modeling/proposal_generator/rpn.py + proposal_utils.py
find_top_rpn_proposals), and StandardROIHeads' 2-FC box head + mask head
pooling 7^2/14^2 from p2..p5 (modeling/roi_heads/roi_heads.py:530+)).

TPU shape discipline is the same as the C4 GeneralizedRCNN: fixed-capacity
proposals with validity masks, all selection inside one jitted program.
Exposes the same trainer/eval protocol (`cddmsl_losses`, `init_all`,
`inference`) so DefaultTrainer and make_train_step/make_eval_step work
unchanged — the caption-consistency arguments are accepted and ignored
(this family has no language branches; set TPU.ENABLE_CAPTION_CONSISTENCY
to false in configs, and the losses are identical either way)."""

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures import boxes as box_ops
from .backbone.resnet import D2ResNet, FPN
from .fast_rcnn import DetectionResult
from .rcnn import DetBatch
from .roi_heads import CLIPStandardROIHeads
from .rpn import FPNRPN


class FPNRCNN(nn.Module):
    num_classes: int = 80
    depth: int = 50
    mask_on: bool = False
    # RPN (d2 FPN defaults: one size per level, topk per level 2000/1000,
    # post 1000/1000 — reference Base-RCNN-FPN.yaml + config/defaults.py)
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_pre_nms_topk: Tuple[int, int] = (2000, 1000)  # (train, test) per level
    rpn_post_nms_topk: Tuple[int, int] = (1000, 1000)
    rpn_nms_thresh: float = 0.7
    rpn_loss_weight: float = 1.0
    rpn_smooth_l1_beta: float = 0.0
    roi_smooth_l1_beta: float = 0.0
    # RoI heads
    roi_batch_size_per_image: int = 512
    roi_positive_fraction: float = 0.25
    fc_dim: int = 1024
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_canvas_stride: float = 4.0
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    keypoint_loss_weight: float = 1.0
    keypoint_loss_normalizer: float = -1.0  # <=0 = by-visible (see roi_heads)
    use_text_emb: bool = False
    emb_dim: int = 1024
    temperature: float = 0.01
    # Cascade R-CNN heads instead of StandardROIHeads (reference
    # ROI_HEADS.NAME=CascadeROIHeads on Base-RCNN-FPN, configs/Misc/
    # cascade_mask_rcnn_*)
    cascade: bool = False
    # bottom-up choice (reference BACKBONE.NAME): 'd2_resnet'
    # (build_resnet_fpn_backbone) or 'clip' (build_clip_resnet_fpn_backbone,
    # clip_backbone.py:664 — the RegionCLIP LVIS FPN transfer recipe)
    backbone_type: str = "d2_resnet"
    clip_layers: Sequence[int] = (3, 4, 6, 3)  # CLIP RN50
    # RegNet bottom-up (reference configs/COCO-InstanceSegmentation/
    # mask_rcnn_regnet{x,y}_4gf_dds_fpn_1x.py + the new_baselines regnet LSJ
    # recipes): (w_a, w_0, w_m, depth, group_width, se_ratio) — defaults are
    # RegNetX-4GF; se_ratio > 0 makes it RegNetY
    regnet_spec: Sequence[float] = (38.65, 96, 2.43, 23, 40, 0.0)
    fpn_out_channels: int = 256
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32
    # compile-light overrides (tests)
    backbone_width: int = 0
    # backbone breadth knobs (RESNETS.*): ResNeXt cardinality, C2-style
    # stride placement, norm choice, DCN stages
    num_groups: int = 1
    stride_in_1x1: bool = True
    backbone_norm: str = "FrozenBN"
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    # FastRCNNConvFCHead shape + GN norms (the Misc GN zoo configs)
    box_num_conv: int = 0
    box_conv_dim: int = 256
    box_num_fc: int = 2
    box_conv_norm: str = ""
    fpn_norm: str = ""
    mask_conv_norm: str = ""
    box_reg_loss_type: str = "smooth_l1"
    box_reg_loss_weight: float = 1.0
    rpn_box_reg_loss_type: str = "smooth_l1"
    rpn_box_reg_loss_weight: float = 1.0
    cls_agnostic_bbox_reg: bool = False
    mask_cls_agnostic: bool = False
    # DC5 assembly (reference configs/Base-RCNN-DilatedC5.yaml): dilated
    # stride-16 res5 is the ONE feature map — no FPN; the RPN (all 5 anchor
    # sizes on the single level) and the StandardROIHeads poolers read res5.
    dc5: bool = False
    # Fast R-CNN mode (reference PROPOSAL_GENERATOR.NAME=PrecomputedProposals,
    # fast_rcnn_R_50_FPN_1x.yaml): no RPN — proposals come precomputed in
    # DetBatch.proposal_{boxes,scores,valid} via MODEL.LOAD_PROPOSALS
    load_proposals: bool = False
    res2_out_channels: int = 256  # compile-light override (tests)

    def setup(self):
        if self.backbone_type == "clip":
            from .backbone.clip_resnet import ModifiedResNet

            assert not self.dc5, "CLIP bottom-up has no DC5 form"
            w = self.backbone_width or 64
            self.backbone = ModifiedResNet(
                layers=tuple(self.clip_layers),
                output_dim=self.emb_dim,
                heads=(w * 32) // 64,
                width=w,
                out_features=("res2", "res3", "res4", "res5"),
                dtype=self.dtype,
            )
            res5_channels = w * 32
        elif self.backbone_type == "regnet":
            from .backbone.regnet import RegNet, generate_regnet_parameters

            assert not self.dc5, "RegNet bottom-up has no DC5 form"
            w_a, w_0, w_m, rd, gw, se = self.regnet_spec
            self.backbone = RegNet(
                w_a=float(w_a), w_0=int(w_0), w_m=float(w_m), depth=int(rd),
                group_width=int(gw), se_ratio=float(se),
                out_features=("s1", "s2", "s3", "s4"), dtype=self.dtype,
            )
            widths, _, _ = generate_regnet_parameters(
                float(w_a), int(w_0), float(w_m), int(rd), int(gw)
            )
            res5_channels = int(widths[-1])
        else:
            self.backbone = D2ResNet(
                depth=self.depth,
                out_features=("res5",) if self.dc5 else ("res2", "res3", "res4", "res5"),
                res5_dilation=2 if self.dc5 else 1,
                num_groups=self.num_groups,
                width_per_group=self.backbone_width or 64,
                stride_in_1x1=self.stride_in_1x1,
                norm=self.backbone_norm,
                deform_on_per_stage=tuple(self.deform_on_per_stage),
                deform_modulated=self.deform_modulated,
                res2_out_channels=self.res2_out_channels,
                dtype=self.dtype,
            )
            res5_channels = self.res2_out_channels * 8
        if not self.dc5:
            self.fpn = FPN(
                in_features=(
                    ("s1", "s2", "s3", "s4")
                    if self.backbone_type == "regnet"
                    else ("res2", "res3", "res4", "res5")
                ),
                out_channels=self.fpn_out_channels,
                top_block_p6=True,  # RPN sees p6 (Base-RCNN-FPN IN_FEATURES)
                norm=self.fpn_norm,
                dtype=self.dtype,
            )
        if not self.load_proposals:
            self.proposal_generator = FPNRPN(
                in_channels=res5_channels if self.dc5 else self.fpn_out_channels,
                strides=(16,) if self.dc5 else (4, 8, 16, 32, 64),
                anchor_sizes=(tuple(self.anchor_sizes),) if self.dc5 else tuple(self.anchor_sizes),
                anchor_aspect_ratios=tuple(self.anchor_aspect_ratios),
                batch_size_per_image=self.rpn_batch_size_per_image,
                positive_fraction=self.rpn_positive_fraction,
                pre_nms_topk_train=self.rpn_pre_nms_topk[0],
                pre_nms_topk_test=self.rpn_pre_nms_topk[1],
                post_nms_topk_train=self.rpn_post_nms_topk[0],
                post_nms_topk_test=self.rpn_post_nms_topk[1],
                nms_thresh=self.rpn_nms_thresh,
                loss_weight=self.rpn_loss_weight,
                smooth_l1_beta=self.rpn_smooth_l1_beta,
                box_reg_loss_type=self.rpn_box_reg_loss_type,
                box_reg_loss_weight=self.rpn_box_reg_loss_weight,
                dtype=self.dtype,
            )
        if self.cascade:
            # Cascade R-CNN on FPN (reference configs/Misc/
            # cascade_mask_rcnn_R_50_FPN_*: Base-RCNN-FPN with
            # ROI_HEADS.NAME=CascadeROIHeads)
            from .cascade_rcnn import CascadeROIHeads

            assert not self.keypoint_on, "cascade has no keypoint branch"
            self.roi_heads = CascadeROIHeads(
                num_classes=self.num_classes,
                pooler_scales=(1 / 16,) if self.dc5 else (1 / 4, 1 / 8, 1 / 16, 1 / 32),
                batch_size_per_image=self.roi_batch_size_per_image,
                positive_fraction=self.roi_positive_fraction,
                score_thresh_test=self.score_thresh_test,
                nms_thresh_test=self.nms_thresh_test,
                detections_per_image=self.detections_per_image,
                mask_on=self.mask_on,
                mask_num_conv=self.mask_num_conv,
                mask_conv_dim=self.mask_conv_dim,
                mask_canvas_stride=self.mask_canvas_stride,
                dtype=self.dtype,
            )
            return
        self.roi_heads = CLIPStandardROIHeads(
            pooler_scales=(1 / 16,) if self.dc5 else (1 / 4, 1 / 8, 1 / 16, 1 / 32),
            num_classes=self.num_classes,
            batch_size_per_image=self.roi_batch_size_per_image,
            positive_fraction=self.roi_positive_fraction,
            fc_dim=self.fc_dim,
            use_text_emb=self.use_text_emb,
            emb_dim=self.emb_dim,
            temperature=self.temperature,
            score_thresh_test=self.score_thresh_test,
            nms_thresh_test=self.nms_thresh_test,
            detections_per_image=self.detections_per_image,
            mask_on=self.mask_on,
            mask_num_conv=self.mask_num_conv,
            mask_conv_dim=self.mask_conv_dim,
            mask_conv_norm=self.mask_conv_norm,
            mask_canvas_stride=self.mask_canvas_stride,
            smooth_l1_beta=self.roi_smooth_l1_beta,
            box_num_conv=self.box_num_conv,
            box_conv_dim=self.box_conv_dim,
            box_num_fc=self.box_num_fc,
            box_conv_norm=self.box_conv_norm,
            box_reg_loss_type=self.box_reg_loss_type,
            box_reg_loss_weight=self.box_reg_loss_weight,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            mask_cls_agnostic=self.mask_cls_agnostic,
            keypoint_on=self.keypoint_on,
            num_keypoints=self.num_keypoints,
            keypoint_conv_dims=tuple(self.keypoint_conv_dims),
            keypoint_loss_weight=self.keypoint_loss_weight,
            keypoint_loss_normalizer=self.keypoint_loss_normalizer,
            dtype=self.dtype,
        )

    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = images
        if float(sum(self.pixel_mean)) < 3.0:  # CLIP-style stats on [0,1]
            x = x / 255.0
        return ((x - mean) / std).astype(self.dtype)

    def _features(self, images: jnp.ndarray):
        if self.dc5:
            res5 = self.backbone(self._normalize(images))["res5"]
            return [res5], [res5]
        feats = self.fpn(self.backbone(self._normalize(images)))
        head_levels = [feats[k] for k in ("p2", "p3", "p4", "p5")]
        rpn_levels = head_levels + [feats["p6"]]
        return head_levels, rpn_levels

    def _batch_proposals(self, batch: DetBatch):
        """Precomputed proposals as a Proposals pytree (reference
        PrecomputedProposals: boxes came clipped/topk'd from the mapper)."""
        from .rpn import Proposals

        assert batch.proposal_boxes is not None, (
            "load_proposals=True needs DetBatch.proposal_boxes (set "
            "MODEL.LOAD_PROPOSALS + DATASETS.PROPOSAL_FILES_*)"
        )
        scores = (
            batch.proposal_scores
            if batch.proposal_scores is not None
            else jnp.zeros(batch.proposal_boxes.shape[:2], jnp.float32)
        )
        return Proposals(
            boxes=batch.proposal_boxes,
            scores=jnp.where(batch.proposal_valid, scores, -jnp.inf),
            valid=batch.proposal_valid,
        )

    def supervised_losses(self, batch: DetBatch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        head_levels, rpn_levels = self._features(batch.image)
        k1, k2 = jax.random.split(rng)
        if self.load_proposals:
            proposals, rpn_losses = self._batch_proposals(batch), {}
        else:
            proposals, rpn_losses = self.proposal_generator(
                rpn_levels, batch.image_sizes, training=True,
                gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=k1,
            )
        _, det_losses = self.roi_heads(
            head_levels, proposals, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid, gt_masks=batch.gt_masks if self.mask_on else None,
            gt_keypoints=batch.gt_keypoints if self.keypoint_on else None,
            rng=k2,
        )
        return {**rpn_losses, **det_losses}

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.supervised_losses(batch, rng)

    def init_all(self, batch: DetBatch, rng: jax.Array):
        """One call touching every submodule (train heads); inference reuses
        the same parameters."""
        return self.supervised_losses(batch, rng)

    def cddmsl_losses(
        self,
        batch: DetBatch,
        rng: jax.Array,
        caption_on: jnp.ndarray,
        kd_regularization: bool = True,
        enable_caption: bool = True,
    ):
        """Trainer protocol (engine/train_loop.py make_train_step). The FPN
        family has no language branches — the caption gates are ignored."""
        del caption_on, kd_regularization, enable_caption
        return self.supervised_losses(batch, rng)

    def inference(self, batch: DetBatch, do_postprocess: bool = True) -> DetectionResult:
        head_levels, rpn_levels = self._features(batch.image)
        if self.load_proposals:
            proposals = self._batch_proposals(batch)
        else:
            proposals, _ = self.proposal_generator(rpn_levels, batch.image_sizes, training=False)
        detections, _ = self.roi_heads(head_levels, proposals, batch.image_sizes, training=False)
        if do_postprocess:
            # detector_postprocess (reference rcnn.py:770-784)
            scale = (batch.orig_sizes / jnp.maximum(batch.image_sizes, 1)).astype(jnp.float32)
            sxy = jnp.stack([scale[:, 1], scale[:, 0], scale[:, 1], scale[:, 0]], axis=-1)
            boxes = detections.boxes * sxy[:, None, :]
            boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(boxes, batch.orig_sizes)
            detections = detections._replace(boxes=boxes)
            if detections.keypoints is not None:
                kxy = detections.keypoints[..., :2] * jnp.stack(
                    [scale[:, 1], scale[:, 0]], axis=-1
                )[:, None, None, :]
                detections = detections._replace(
                    keypoints=jnp.concatenate([kxy, detections.keypoints[..., 2:]], axis=-1)
                )
        return detections
