"""Panoptic FPN meta-architecture (reference detectron2/modeling/meta_arch/
panoptic_fpn.py:266 PanopticFPN): one FPN backbone shared by an instance
branch (RPN + StandardROIHeads-style box heads) and a semantic branch
(SemSegFPNHead), with `combine_semantic_and_instance_outputs` producing the
panoptic segmentation at inference (host-side numpy, as the reference's
combine is post-processing logic)."""

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .backbone.resnet import D2ResNet, FPN
from .extra_meta_archs import SemSegFPNHead
from .rcnn import DetBatch
from .roi_heads import CLIPStandardROIHeads
from .rpn import RPN, Proposals


class PanopticFPN(nn.Module):
    num_classes: int = 20  # thing classes
    sem_seg_classes: int = 54  # stuff classes
    depth: int = 50
    instance_loss_weight: float = 1.0
    sem_seg_loss_weight: float = 0.5
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    # Misc/panoptic_fpn_R_101_dconv_cascade_gn_3x knobs (reference: GN on
    # backbone to support semantic seg, cascade + deform conv for
    # localization)
    backbone_norm: str = "FrozenBN"
    fpn_norm: str = ""
    sem_seg_norm: str = ""  # MODEL.SEM_SEG_HEAD.NORM
    stride_in_1x1: bool = True
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    cascade: bool = False
    backbone_width: int = 0  # compile-light override (tests)
    # instance mask branch (reference Base-Panoptic-FPN.yaml MASK_ON: True —
    # PanopticFPN is Mask R-CNN + semseg; the combine paints MASKS)
    mask_on: bool = False
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_canvas_stride: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = D2ResNet(
            depth=self.depth, out_features=("res2", "res3", "res4", "res5"),
            norm=self.backbone_norm, stride_in_1x1=self.stride_in_1x1,
            deform_on_per_stage=tuple(self.deform_on_per_stage),
            deform_modulated=self.deform_modulated,
            width_per_group=self.backbone_width or 64, dtype=self.dtype,
        )
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"), top_block_p6=False,
                       norm=self.fpn_norm, dtype=self.dtype)
        self.proposal_generator = RPN(
            in_channels=256, stride=4,  # applied per level with its own stride below
            anchor_sizes=(32,), anchor_aspect_ratios=(0.5, 1.0, 2.0),
            pre_nms_topk_train=256, pre_nms_topk_test=128,
            post_nms_topk_train=64, post_nms_topk_test=32,
            dtype=self.dtype,
        )
        if self.cascade:
            # ROI_HEADS.NAME=CascadeROIHeads (cascade deltas are
            # class-agnostic by construction, matching the config's
            # CLS_AGNOSTIC_BBOX_REG: True)
            from .cascade_rcnn import CascadeROIHeads

            self.roi_heads = CascadeROIHeads(
                num_classes=self.num_classes,
                pooler_scales=(1 / 4, 1 / 8, 1 / 16, 1 / 32),
                batch_size_per_image=64,
                mask_on=self.mask_on, mask_num_conv=self.mask_num_conv,
                mask_conv_dim=self.mask_conv_dim,
                mask_canvas_stride=self.mask_canvas_stride,
                dtype=self.dtype,
            )
        else:
            self.roi_heads = CLIPStandardROIHeads(
                num_classes=self.num_classes, use_text_emb=False,
                batch_size_per_image=64, emb_dim=1024,
                mask_on=self.mask_on, mask_num_conv=self.mask_num_conv,
                mask_conv_dim=self.mask_conv_dim,
                mask_canvas_stride=self.mask_canvas_stride,
                dtype=self.dtype,
            )
        self.sem_seg_head = SemSegFPNHead(
            num_classes=self.sem_seg_classes, norm=self.sem_seg_norm, dtype=self.dtype
        )

    def _norm(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.dtype)

    def _features(self, images):
        feats = self.fpn(self.backbone(self._norm(images)))
        keys = sorted(feats.keys())  # p2, p3, p4, p5
        return [feats[k] for k in keys]

    def _sem_logits(self, levels, hw):
        logits = self.sem_seg_head(levels)
        b, h, w, c = logits.shape
        return jax.image.resize(logits, (b, hw[0], hw[1], c), method="bilinear")

    def __call__(self, batch: DetBatch, sem_seg_gt: jnp.ndarray, rng: jax.Array):
        """Training: instance + semantic losses (panoptic_fpn.py forward)."""
        levels = self._features(batch.image)
        k1, k2 = jax.random.split(rng)
        # RPN on p2 (single-level proposal generation keeps this compact; the
        # reference runs per-level — multi-level RPN lives in RetinaNet here)
        proposals, rpn_losses = self.proposal_generator(
            levels[0], batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=k1,
        )
        _, det_losses = self.roi_heads(
            levels, proposals, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid,
            gt_masks=batch.gt_masks if self.mask_on else None, rng=k2,
        )
        logits = self._sem_logits(levels, batch.image.shape[1:3])
        valid = sem_seg_gt != 255
        gt = jnp.where(valid, sem_seg_gt, 0)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, gt[..., None], axis=-1)[..., 0]
        sem_loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        losses = {k: v * self.instance_loss_weight for k, v in {**rpn_losses, **det_losses}.items()}
        losses["loss_sem_seg"] = sem_loss * self.sem_seg_loss_weight
        return losses

    # ---- trainer protocol (engine/train_loop.py make_train_step /
    # engine/defaults.py DefaultTrainer) ----
    def init_all(self, batch: DetBatch, rng: jax.Array):
        sem_gt = (
            batch.sem_seg
            if batch.sem_seg is not None
            else jnp.zeros(batch.image.shape[:3], jnp.int32)
        )
        return self(batch, sem_gt, rng)

    def cddmsl_losses(
        self,
        batch: DetBatch,
        rng: jax.Array,
        caption_on=None,
        kd_regularization: bool = True,
        enable_caption: bool = True,
    ):
        """PanopticFPN has no language branches — the caption gates are
        ignored; the semantic target rides in `batch.sem_seg`."""
        del caption_on, kd_regularization, enable_caption
        assert batch.sem_seg is not None, (
            "PanopticFPN training needs DetBatch.sem_seg (use a panoptic "
            "dataset — the loader selects PanopticDatasetMapper automatically)"
        )
        return self(batch, batch.sem_seg, rng)

    def inference(self, batch: DetBatch):
        """Returns (detections, sem_seg argmax) — combined on host by
        combine_semantic_and_instance_outputs."""
        levels = self._features(batch.image)
        proposals, _ = self.proposal_generator(levels[0], batch.image_sizes, training=False)
        detections, _ = self.roi_heads(levels, proposals, batch.image_sizes, training=False)
        sem_seg = jnp.argmax(self._sem_logits(levels, batch.image.shape[1:3]), axis=-1)
        return detections, sem_seg


def combine_semantic_and_instance_outputs(
    det_boxes: np.ndarray,  # (D, 4)
    det_scores: np.ndarray,
    det_classes: np.ndarray,
    det_valid: np.ndarray,
    sem_seg: np.ndarray,  # (H, W) argmax
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_score_thresh: float = 0.5,
    det_masks: Optional[np.ndarray] = None,  # (D, m, m) box-space probs
) -> Tuple[np.ndarray, list]:
    """Host-side combine (reference panoptic_fpn.py:
    combine_semantic_and_instance_outputs): paint confident instances (their
    pasted masks when MASK_ON, else their boxes) in score order, then large
    stuff regions. Returns (panoptic_seg ids, segments_info)."""
    H, W = sem_seg.shape
    panoptic = np.zeros((H, W), np.int32)
    segments = []
    current_id = 0
    order = np.argsort(-det_scores)
    for i in order:
        if not det_valid[i] or det_scores[i] < instances_score_thresh:
            continue
        x1, y1, x2, y2 = det_boxes[i].astype(int)
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, W), min(y2, H)
        if det_masks is not None:
            from ..evaluation.masks import paste_masks_np

            mask = paste_masks_np(
                det_masks[i : i + 1], det_boxes[i : i + 1], (H, W)
            )[0].astype(bool)
        else:
            mask = np.zeros((H, W), bool)
            mask[y1:y2, x1:x2] = True
        area = mask.sum()
        if area == 0:
            continue
        intersect = (mask & (panoptic > 0)).sum()
        if intersect / max(area, 1) > overlap_threshold:
            continue
        mask &= panoptic == 0
        current_id += 1
        panoptic[mask] = current_id
        segments.append({"id": current_id, "isthing": True,
                         "category_id": int(det_classes[i]), "score": float(det_scores[i])})
    for cat in np.unique(sem_seg):
        mask = (sem_seg == cat) & (panoptic == 0)
        if mask.sum() < stuff_area_limit:
            continue
        current_id += 1
        panoptic[mask] = current_id
        segments.append({"id": current_id, "isthing": False, "category_id": int(cat)})
    return panoptic, segments
