"""GeneralizedRCNN meta-architecture with the CDDMSL branches (TPU-native).

Re-implements the reference multi-branch GeneralizedRCNN
(detectron2/modeling/meta_arch/rcnn.py:351-790):
  * default supervised branch: detection losses on the source view
    (rcnn.py:592-623)
  * `caption_consistency` (:413-421 / v2l_contrastive :255-319): both views
    -> 224^2 bicubic resize + center-crop of the PADDED tensor (replicating
    preprocess_image_train :161-179, padding included) -> backbone attnpool
    global embeddings -> frozen ClipCap mapper -> trainable projector ->
    bidirectional InfoNCE over the GLOBAL batch; optional KD: L1 between the
    student's src v2l features and the frozen offline (RegionCLIP) backbone's
    (:265-274)
  * `caption_consistency_regionLevel` (:422-470): full-res both views ->
    RPN proposals on src under stop_gradient, 16 random valid proposals/img
    (replacing randperm[:16] with a PRNG rank trick), same boxes pooled from
    BOTH feature maps -> attnpool -> v2l -> projector -> InfoNCE
  * `image_consistency`(+regionLevel) (:471-522): same without the language
    mapping. NOTE: the reference feeds 1024-d attnpool outputs into its
    768-d projector, which cannot execute; per SURVEY.md we implement the
    intended behavior with a dedicated 1024->768->256 image projector.
  * `supervised_target` (:523-555): detection losses on the translated view.
  * inference (:690) + detector_postprocess rescaling (:770-784)

Parallelism: the reference gathers features across GPUs with a
grad-carrying GatherLayer (clipcap/gather.py:5-19). Here the train step is a
single jit program over the device mesh with the batch sharded on the 'data'
axis — the contrastive similarity matrix is simply computed over the global
batch and XLA inserts the (differentiable) all-gather.
"""

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures import boxes as box_ops
from .backbone.clip_resnet import ModifiedResNet
from .clipcap import Projector, TransformerMapper, v2l
from .fast_rcnn import DetectionResult
from .roi_heads import CLIPRes5ROIHeads
from .rpn import RPN, Proposals


class DetBatch(NamedTuple):
    """Static-shape batch (the padded replacement for batched_inputs dicts)."""

    image: jnp.ndarray  # (B, H, W, 3) raw 0..255
    image_sizes: jnp.ndarray  # (B, 2) true (h, w) in the padded canvas
    orig_sizes: jnp.ndarray  # (B, 2) original image (h, w) for rescaling
    gt_boxes: jnp.ndarray  # (B, G, 4) XYXY in current canvas coords
    gt_classes: jnp.ndarray  # (B, G) int32
    gt_valid: jnp.ndarray  # (B, G) bool
    image_trgt: Optional[jnp.ndarray] = None  # (B, H, W, 3) translated twin
    # (B, G, H/ms, W/ms) {0,1} GT bitmasks at TPU.MASK_CANVAS_STRIDE (MASK_ON)
    gt_masks: Optional[jnp.ndarray] = None
    # (B, G, K, 3) (x, y, vis) GT keypoints in canvas coords (KEYPOINT_ON;
    # reference structures/keypoints.py Keypoints)
    gt_keypoints: Optional[jnp.ndarray] = None
    # precomputed proposals (MODEL.LOAD_PROPOSALS, reference
    # proposal_generator PrecomputedProposals + data/detection_utils.py
    # transform_proposals): (B, P, 4) canvas-coord boxes, (B, P) objectness
    # logits, (B, P) validity
    proposal_boxes: Optional[jnp.ndarray] = None
    proposal_scores: Optional[jnp.ndarray] = None
    proposal_valid: Optional[jnp.ndarray] = None
    # (B, H, W) int32 stuff-class semantic target, 255 = ignore (PanopticFPN
    # / SemanticSegmentor training; reference batched_inputs "sem_seg")
    sem_seg: Optional[jnp.ndarray] = None


def infonce_bidirectional(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize, similarity matrix, CE both ways / 2
    (reference rcnn.py:305-319; NOTE: no temperature, cosine logits)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    logits = a @ b.T
    n = logits.shape[0]
    labels = jnp.arange(n)
    lp_ab = jax.nn.log_softmax(logits, axis=1)
    lp_ba = jax.nn.log_softmax(logits.T, axis=1)
    ce_ab = -lp_ab[labels, labels].mean()
    ce_ba = -lp_ba[labels, labels].mean()
    return (ce_ab + ce_ba) / 2.0


class GeneralizedRCNN(nn.Module):
    """Fields mirror from_config (reference rcnn.py:101-160)."""

    # backbone spec
    backbone_type: str = "clip"  # 'clip' (ModifiedResNet) or 'd2_resnet'
    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_width: int = 64
    backbone_depth: int = 50  # d2_resnet depth (MODEL.RESNETS.DEPTH)
    backbone_out_features: Sequence[str] = ("res4",)
    embed_dim: int = 1024
    input_resolution: int = 224
    # rpn spec
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_pre_nms_topk: Tuple[int, int] = (12000, 6000)  # train, test
    rpn_post_nms_topk: Tuple[int, int] = (2000, 1000)
    rpn_nms_thresh: float = 0.7
    rpn_loss_weight: float = 1.0
    # roi spec
    num_classes: int = 20
    roi_batch_size_per_image: int = 512
    roi_positive_fraction: float = 0.25
    pooler_resolution: int = 14
    use_text_emb: bool = True
    temperature: float = 0.01
    focal_gamma: Optional[float] = None
    bg_loss_weight: Optional[float] = None
    cls_agnostic_bbox_reg: bool = False
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    # mask branch (MODEL.MASK_ON; reference roi_heads.py:480-534)
    mask_on: bool = False
    mask_num_conv: int = 0
    mask_conv_dim: int = 256
    mask_cls_agnostic: bool = False
    mask_canvas_stride: float = 4.0
    # keypoint branch (MODEL.KEYPOINT_ON; reference roi_heads keypoint path)
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_dims: Sequence[int] = (512,) * 8
    keypoint_loss_weight: float = 1.0
    keypoint_loss_normalizer: float = -1.0  # <=0 = by-visible (see roi_heads)
    # inference options (reference fast_rcnn.py:466-527)
    no_box_delta: bool = False
    multiply_rpn_score: bool = False
    soft_nms_enabled: bool = False
    soft_nms_method: str = "gaussian"
    soft_nms_sigma: float = 0.5
    soft_nms_prune: float = 0.001
    # input
    pixel_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073)
    pixel_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711)
    # cddmsl
    with_offline_backbone: bool = True
    region_consistency_boxes: int = 16
    v2l_image_size: int = 224
    v2l_mapper_layers: int = 8
    v2l_mapper_tokens: int = 40
    backbone_remat: bool = False
    use_pallas_roi_align: bool = False
    roi_chunk_size: int = 128
    # GPipe pipeline parallelism for the V2L mapper stack (parallel/pp.py):
    # mesh axis name carrying the pipeline stages; None/"" = off
    pipeline_axis: Optional[str] = None
    pipeline_microbatches: int = 0
    # Switch-MoE contrastive projector (parallel/ep.py, models/moe.py):
    # >0 replaces the dense projector with that many routed expert MLPs;
    # moe_expert_axis names the mesh axis sharding them (expert parallelism)
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_expert_axis: Optional[str] = None
    moe_aux_weight: float = 0.01
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_type == "d2_resnet":
            # plain Faster R-CNN baseline (reference faster_rcnn_R_50_C4.yaml:
            # build_resnet_backbone + Res5ROIHeads, mean-pooled linear head)
            from .backbone.resnet import D2ResNet

            mk_backbone = lambda name: D2ResNet(
                depth=self.backbone_depth,
                out_features=tuple(self.backbone_out_features),
                dtype=self.dtype,
                name=name,
            )
        else:
            mk_backbone = lambda name: ModifiedResNet(
                layers=self.backbone_layers,
                output_dim=self.embed_dim,
                heads=self.backbone_width * 32 // 64,
                width=self.backbone_width,
                out_features=self.backbone_out_features,
                input_resolution=self.input_resolution,
                remat=self.backbone_remat,
                dtype=self.dtype,
                name=name,
            )
        self.backbone = mk_backbone("backbone")
        if self.with_offline_backbone:
            # frozen 2nd copy, weights force-loaded from PRE_TRAINED_RCLIP_PATH
            # (reference rcnn.py:105-108, train_loop.py:150-164)
            self.offline_backbone = mk_backbone("offline_backbone")
        self.proposal_generator = RPN(
            in_channels=self.backbone_width * 16,
            stride=16,
            anchor_sizes=self.anchor_sizes,
            anchor_aspect_ratios=self.anchor_aspect_ratios,
            batch_size_per_image=self.rpn_batch_size_per_image,
            positive_fraction=self.rpn_positive_fraction,
            pre_nms_topk_train=self.rpn_pre_nms_topk[0],
            pre_nms_topk_test=self.rpn_pre_nms_topk[1],
            post_nms_topk_train=self.rpn_post_nms_topk[0],
            post_nms_topk_test=self.rpn_post_nms_topk[1],
            nms_thresh=self.rpn_nms_thresh,
            loss_weight=self.rpn_loss_weight,
            dtype=self.dtype,
        )
        self.roi_heads = CLIPRes5ROIHeads(
            num_classes=self.num_classes,
            batch_size_per_image=self.roi_batch_size_per_image,
            positive_fraction=self.roi_positive_fraction,
            pooler_resolution=self.pooler_resolution,
            use_text_emb=self.use_text_emb,
            emb_dim=self.embed_dim,
            temperature=self.temperature,
            focal_gamma=self.focal_gamma,
            bg_loss_weight=self.bg_loss_weight,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            score_thresh_test=self.score_thresh_test,
            nms_thresh_test=self.nms_thresh_test,
            detections_per_image=self.detections_per_image,
            use_pallas_roi_align=self.use_pallas_roi_align,
            roi_chunk_size=self.roi_chunk_size,
            mask_on=self.mask_on,
            mask_num_conv=self.mask_num_conv,
            mask_conv_dim=self.mask_conv_dim,
            mask_cls_agnostic=self.mask_cls_agnostic,
            mask_canvas_stride=self.mask_canvas_stride,
            keypoint_on=self.keypoint_on,
            num_keypoints=self.num_keypoints,
            keypoint_conv_dims=tuple(self.keypoint_conv_dims),
            keypoint_loss_weight=self.keypoint_loss_weight,
            keypoint_loss_normalizer=self.keypoint_loss_normalizer,
            no_box_delta=self.no_box_delta,
            multiply_rpn_score=self.multiply_rpn_score,
            soft_nms_enabled=self.soft_nms_enabled,
            soft_nms_method=self.soft_nms_method,
            soft_nms_sigma=self.soft_nms_sigma,
            soft_nms_prune=self.soft_nms_prune,
            dtype=self.dtype,
        )
        # frozen ClipCap mapper (v2l), loaded from VISION_TO_LANG_PATH
        self.v2l_mapper = TransformerMapper(
            dim_clip=self.embed_dim,
            prefix_length=self.v2l_mapper_tokens,
            clip_length=self.v2l_mapper_tokens,
            num_layers=self.v2l_mapper_layers,
            pipeline_axis=self.pipeline_axis or None,
            pipeline_microbatches=self.pipeline_microbatches or None,
            dtype=self.dtype,
        )
        # trainable contrastive head (rcnn.py:95-99); optionally a Switch-MoE
        # (TPU.MOE.NUM_EXPERTS > 0 — capability beyond the dense reference)
        if self.moe_experts:
            from .moe import MoEMLP

            self.projector = MoEMLP(
                num_experts=self.moe_experts,
                in_dim=768,
                hidden=768,
                out_dim=256,
                capacity_factor=self.moe_capacity_factor,
                expert_axis=self.moe_expert_axis or None,
                dtype=self.dtype,
            )
        else:
            self.projector = Projector(in_dim=768, dtype=self.dtype)
        # image-consistency head (see module docstring: intended-behavior fix)
        self.image_projector = Projector(in_dim=self.embed_dim, dtype=self.dtype)

    # ---------------- preprocessing ----------------
    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = images
        if float(sum(self.pixel_mean)) < 3.0:  # CLIP stats: inputs scaled to [0,1]
            x = x / 255.0
        return ((x - mean) / std).astype(self.dtype)

    def _v2l_preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """Replicates preprocess_image_train (rcnn.py:161-179): /255, bicubic
        short-side-224 resize of the PADDED canvas, center-crop 224^2, CLIP
        normalize."""
        b, h, w, _ = images.shape
        x = images / 255.0
        size = self.v2l_image_size
        scale = size / min(h, w)
        nh, nw = (size, max(size, int(round(w * scale)))) if h <= w else (max(size, int(round(h * scale))), size)
        x = jax.image.resize(x, (b, nh, nw, 3), method="bicubic", antialias=False)
        top, left = (nh - size) // 2, (nw - size) // 2
        x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, 3))
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((x - mean) / std).astype(self.dtype)

    def extract_res4(self, images: jnp.ndarray) -> jnp.ndarray:
        """Raw images (B,H,W,3) -> res4 feature map (for the mean-teacher
        domain discriminator, DIS_TYPE='res4')."""
        return self.backbone(self._normalize(images))["res4"]

    # ---------------- branches ----------------
    def supervised_losses(self, batch: DetBatch, rng: jax.Array, on_target: bool = False):
        """Default branch (rcnn.py:592-623); on_target=True gives the
        `supervised_target` branch (:523-555)."""
        images = batch.image_trgt if on_target else batch.image
        x = self._normalize(images)
        features = self.backbone(x)["res4"]
        k1, k2 = jax.random.split(rng)
        proposals, rpn_losses = self.proposal_generator(
            features, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=k1,
        )
        _, det_losses = self.roi_heads(
            features, proposals, batch.image_sizes, training=True,
            res5_fn=self.backbone.res5_forward,
            attnpool_fn=self.backbone.attnpool_forward if self.use_text_emb else None,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid, gt_masks=batch.gt_masks,
            gt_keypoints=batch.gt_keypoints, rng=k2,
        )
        return {**det_losses, **rpn_losses}

    def inference(
        self, batch: DetBatch, do_postprocess: bool = True, quant_res5=None
    ) -> DetectionResult:
        """Eval path (rcnn.py:690): backbone -> RPN -> RoI heads -> (rescale).

        `quant_res5` = (qblocks, act_scales) from quant/ptq.py swaps the res5
        RoI stage for its int8 form (serving-path PTQ; ~1.8x MXU rate)."""
        x = self._normalize(batch.image)
        features = self.backbone(x)["res4"]
        proposals, _ = self.proposal_generator(features, batch.image_sizes, training=False)
        if quant_res5 is not None:
            from ..quant import res5_forward_int8

            res5_fn = lambda crops: res5_forward_int8(quant_res5[0], quant_res5[1], crops)
        else:
            res5_fn = self.backbone.res5_forward
        detections, _ = self.roi_heads(
            features, proposals, batch.image_sizes, training=False,
            res5_fn=res5_fn,
            attnpool_fn=self.backbone.attnpool_forward if self.use_text_emb else None,
        )
        if do_postprocess:
            # detector_postprocess (rcnn.py:770-784): rescale to original size
            scale = (batch.orig_sizes / jnp.maximum(batch.image_sizes, 1)).astype(jnp.float32)
            sxy = jnp.stack([scale[:, 1], scale[:, 0], scale[:, 1], scale[:, 0]], axis=-1)
            boxes = detections.boxes * sxy[:, None, :]
            boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(boxes, batch.orig_sizes)
            detections = detections._replace(boxes=boxes)
            if detections.keypoints is not None:
                # rescale decoded keypoint coords with the boxes (reference
                # detector_postprocess keypoint branch)
                kxy = detections.keypoints[..., :2] * jnp.stack(
                    [scale[:, 1], scale[:, 0]], axis=-1
                )[:, None, None, :]
                detections = detections._replace(
                    keypoints=jnp.concatenate([kxy, detections.keypoints[..., 2:]], axis=-1)
                )
        return detections

    def res5_calib_inputs(self, batch: DetBatch) -> jnp.ndarray:
        """Pooled res4 crops at eval proposals — the representative inputs
        for quant/ptq.py activation calibration (the distribution the int8
        res5 sees at serving time)."""
        x = self._normalize(batch.image)
        features = self.backbone(x)["res4"]
        proposals, _ = self.proposal_generator(features, batch.image_sizes, training=False)
        return self.roi_heads.pool(features, proposals.boxes)

    def _student_v2l(self, images224: jnp.ndarray) -> jnp.ndarray:
        return v2l(self.v2l_mapper(self.backbone.global_embed(images224)))

    def _project(self, feats: jnp.ndarray, losses: Optional[Dict] = None) -> jnp.ndarray:
        """Contrastive projector; when it is a MoE (moe_experts>0) the Switch
        load-balance aux loss is accumulated into `losses`."""
        if self.moe_experts:
            y, aux = self.projector(feats)
            if losses is not None:
                losses["moe_aux"] = losses.get("moe_aux", 0.0) + self.moe_aux_weight * aux
            return y
        return self.projector(feats)

    def caption_consistency(self, batch: DetBatch, kd_regularization: bool = True):
        """Image-level language-domain InfoNCE (+ KD) (rcnn.py:255-319,413-421)."""
        src = self._v2l_preprocess(batch.image)
        trgt = self._v2l_preprocess(batch.image_trgt)

        feats_trgt = self._student_v2l(trgt)
        feats_src = self._student_v2l(src)

        losses = {}
        if kd_regularization and self.with_offline_backbone:
            teacher = v2l(self.v2l_mapper(self.offline_backbone.global_embed(src)))
            teacher = jax.lax.stop_gradient(teacher)
            losses["kd_loss"] = jnp.mean(jnp.abs(teacher.astype(jnp.float32) - feats_src.astype(jnp.float32)))

        p_trgt = self._project(feats_trgt, losses)
        p_src = self._project(feats_src, losses)
        losses["cont_loss"] = infonce_bidirectional(p_trgt, p_src)
        return losses

    def _random_region_boxes(self, proposals: Proposals, rng: jax.Array) -> jnp.ndarray:
        """randperm(len(p))[:16] (rcnn.py:437-438) as a PRNG rank trick over
        valid proposals."""
        b, k, _ = proposals.boxes.shape
        n = self.region_consistency_boxes

        def per_image(boxes, valid, key):
            scores = jnp.where(valid, jax.random.uniform(key, (k,)), -jnp.inf)
            _, idx = jax.lax.top_k(scores, n)
            return boxes[idx]

        keys = jax.random.split(rng, b)
        return jax.vmap(per_image)(proposals.boxes, proposals.valid, keys)

    def caption_consistency_region(self, batch: DetBatch, rng: jax.Array):
        """Region-level language-domain InfoNCE (rcnn.py:422-470)."""
        src = self._normalize(batch.image)
        trgt = self._normalize(batch.image_trgt)
        f_src = self.backbone(src)["res4"]
        f_trgt = self.backbone(trgt)["res4"]

        proposals, _ = self.proposal_generator(
            jax.lax.stop_gradient(f_src), batch.image_sizes, training=True, compute_losses=False
        )
        boxes = self._random_region_boxes(proposals, rng)  # (B, 16, 4)

        r_src, r_trgt = self.roi_heads.forward_get_features(
            f_src, f_trgt, boxes, self.backbone.res5_forward, self.backbone.attnpool_forward
        )
        losses = {}
        p_src = self._project(v2l(self.v2l_mapper(r_src)), losses)
        p_trgt = self._project(v2l(self.v2l_mapper(r_trgt)), losses)
        losses["cont_loss_region"] = infonce_bidirectional(p_src, p_trgt)
        return losses

    def image_consistency(self, batch: DetBatch):
        """rcnn.py:471-475 / image_contrastive :321-349 (intended behavior)."""
        src = self._v2l_preprocess(batch.image)
        trgt = self._v2l_preprocess(batch.image_trgt)
        p_trgt = self.image_projector(self.backbone.global_embed(trgt))
        p_src = self.image_projector(self.backbone.global_embed(src))
        return {"cont_loss": infonce_bidirectional(p_trgt, p_src)}

    def image_consistency_region(self, batch: DetBatch, rng: jax.Array):
        """rcnn.py:476-522 (intended behavior)."""
        src = self._normalize(batch.image)
        trgt = self._normalize(batch.image_trgt)
        f_src = self.backbone(src)["res4"]
        f_trgt = self.backbone(trgt)["res4"]
        proposals, _ = self.proposal_generator(
            jax.lax.stop_gradient(f_src), batch.image_sizes, training=True, compute_losses=False
        )
        boxes = self._random_region_boxes(proposals, rng)
        r_src, r_trgt = self.roi_heads.forward_get_features(
            f_src, f_trgt, boxes, self.backbone.res5_forward, self.backbone.attnpool_forward
        )
        p_src = self.image_projector(r_src)
        p_trgt = self.image_projector(r_trgt)
        return {"cont_loss": infonce_bidirectional(p_src, p_trgt)}

    def caption_pl_prefixes(self, batch: DetBatch):
        """`caption_pl_img` branch inputs (reference rcnn.py:556-564): CLIP
        embeddings of both views; the src view is the pseudo-label teacher
        (no_grad). The pseudo-caption decode + loss runs OUTSIDE this module
        (engine/train_loop.py make_caption_pl_step) because the ClipCap GPT-2
        is a separate frozen model with its own params."""
        src = self._v2l_preprocess(batch.image)
        trgt = self._v2l_preprocess(batch.image_trgt)
        p_trgt = self.backbone.global_embed(trgt)
        p_src = jax.lax.stop_gradient(self.backbone.global_embed(src))
        return p_src, p_trgt

    def caption_pl_region_prefixes(self, batch: DetBatch, rng: jax.Array):
        """`caption_pl_region` branch inputs (reference rcnn.py:565-591):
        region embeddings of the SAME 16 random proposals from both views."""
        src = self._normalize(batch.image)
        trgt = self._normalize(batch.image_trgt)
        f_src = self.backbone(src)["res4"]
        f_trgt = self.backbone(trgt)["res4"]
        proposals, _ = self.proposal_generator(
            jax.lax.stop_gradient(f_src), batch.image_sizes, training=True, compute_losses=False
        )
        boxes = self._random_region_boxes(proposals, rng)
        r_src, r_trgt = self.roi_heads.forward_get_features(
            f_src, f_trgt, boxes, self.backbone.res5_forward, self.backbone.attnpool_forward
        )
        return jax.lax.stop_gradient(r_src), r_trgt

    def cddmsl_losses(
        self,
        batch: DetBatch,
        rng: jax.Array,
        caption_on: jnp.ndarray,  # bool scalar: past burn-up
        kd_regularization: bool = True,
        enable_caption: bool = True,
    ):
        """The full CDDMSL loss set as ONE fused computation, sharing the
        full-res source backbone forward between the supervised branch and the
        region-level consistency branch (the reference recomputes it;
        rcnn.py:592-623 + :422-470). The caption branches are gated by
        `caption_on` via lax.cond (burn-up)."""
        k_sup, k_roi, k_region = jax.random.split(rng, 3)

        src = self._normalize(batch.image)
        f_src = self.backbone(src)["res4"]

        # ---- supervised detection on the source view ----
        proposals, rpn_losses = self.proposal_generator(
            f_src, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=k_sup,
        )
        _, det_losses = self.roi_heads(
            f_src, proposals, batch.image_sizes, training=True,
            res5_fn=self.backbone.res5_forward,
            attnpool_fn=self.backbone.attnpool_forward if self.use_text_emb else None,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid, gt_masks=batch.gt_masks,
            gt_keypoints=batch.gt_keypoints, rng=k_roi,
        )
        losses = {**det_losses, **rpn_losses}
        if not enable_caption:
            return losses

        def caption_branches(_):
            cc = self.caption_consistency(batch, kd_regularization=kd_regularization)
            # region branch reuses f_src and this step's proposals
            trgt = self._normalize(batch.image_trgt)
            f_trgt = self.backbone(trgt)["res4"]
            boxes = self._random_region_boxes(
                Proposals(
                    jax.lax.stop_gradient(proposals.boxes),
                    jax.lax.stop_gradient(proposals.scores),
                    proposals.valid,
                ),
                k_region,
            )
            r_src, r_trgt = self.roi_heads.forward_get_features(
                f_src, f_trgt, boxes, self.backbone.res5_forward, self.backbone.attnpool_forward
            )
            aux = {}
            p_src = self._project(v2l(self.v2l_mapper(r_src)), aux)
            p_trgt = self._project(v2l(self.v2l_mapper(r_trgt)), aux)
            moe_aux = jnp.asarray(
                cc.get("moe_aux", 0.0) + aux.get("moe_aux", 0.0), jnp.float32
            )
            return (
                cc["cont_loss"],
                cc.get("kd_loss", jnp.zeros(())),
                infonce_bidirectional(p_src, p_trgt),
                moe_aux,
            )

        def caption_off(_):
            return jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(())

        cont, kd, cont_region, moe_aux = jax.lax.cond(
            caption_on, caption_branches, caption_off, None
        )
        losses["cont_loss"] = cont
        if kd_regularization:
            losses["kd_loss"] = kd
        losses["cont_loss_region"] = cont_region
        if self.moe_experts:
            losses["moe_aux"] = moe_aux
        return losses

    def __call__(self, batch: DetBatch, rng: jax.Array):
        """Default = supervised branch (keeps init simple: one call touches
        every submodule except the consistency heads)."""
        return self.supervised_losses(batch, rng)

    def init_all(self, batch: DetBatch, rng: jax.Array):
        """Forward that touches every parameterized path — used only for
        flax init so the full param tree materializes."""
        losses = self.supervised_losses(batch, rng)
        if self.backbone_type == "clip":
            losses.update(self.caption_consistency(batch, kd_regularization=True))
            losses.update(self.caption_consistency_region(batch, rng))
            losses.update({"img_" + k: v for k, v in self.image_consistency(batch).items()})
        return losses
