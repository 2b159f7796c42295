"""RegionCLIP meta-architectures: CLIPFastRCNN and PretrainFastRCNN.

Re-implements the reference clip_rcnn.py (837 LoC; my_clip_rcnn.py is a dead
near-copy per SURVEY.md §2.2):

  * `CLIPFastRCNN`: open-vocabulary detector — a FROZEN offline RPN (its own
    d2-ResNet backbone + RPN head, loaded from MODEL.CLIP.BB_RPN_WEIGHTS)
    proposes regions; the CLIP backbone + C4 RoI head with frozen text
    embeddings recognizes them (zero-shot region classification). Training
    updates only the recognition branch (crop_region_type='RPN').
  * `PretrainFastRCNN`: region-language pretraining — image-text InfoNCE
    over the GLOBAL batch (the reference gathers features across GPUs with
    gather_tensors, comm.py:268; under jit-with-sharding the global matmul is
    direct), plus teacher-distilled region-concept matching
    (get_psuedo_concept_labels + MILCrossEntropy / SoftTargetCrossEntropy,
    comm.py:324-355).
"""

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone.clip_resnet import ModifiedResNet
from .backbone.resnet import D2ResNet
from .fast_rcnn import DetectionResult
from .rcnn import DetBatch
from .roi_heads import CLIPRes5ROIHeads
from .rpn import RPN


def soft_target_cross_entropy(logits: jnp.ndarray, soft_targets: jnp.ndarray) -> jnp.ndarray:
    """reference utils/comm.py:324 SoftTargetCrossEntropy."""
    return jnp.mean(jnp.sum(-soft_targets * jax.nn.log_softmax(logits, axis=-1), axis=-1))


def mil_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Multiple-instance CE (reference utils/comm.py:332 MILCrossEntropy):
    sum probabilities over positive bag elements, then NLL."""
    probs = jax.nn.softmax(logits, axis=-1)
    pos = jnp.sum(probs * targets, axis=-1)
    return jnp.mean(-jnp.log(jnp.clip(pos, 1e-6, 1.0)))


class CLIPFastRCNN(nn.Module):
    """Offline-RPN + CLIP recognition branch (reference clip_rcnn.py
    CLIPFastRCNN)."""

    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_width: int = 64
    embed_dim: int = 1024
    num_classes: int = 80
    offline_depth: int = 50
    rpn_post_nms_topk: Tuple[int, int] = (2000, 1000)
    offline_rpn_nms_thresh: float = 0.9  # MODEL.CLIP.OFFLINE_RPN_NMS_THRESH
    temperature: float = 0.01
    # OVD recipe knobs (reference CLIP_fast_rcnn_R_50_C4_ovd*.yaml):
    # focal-scaled CE + background down-weight at train, no-box-delta /
    # score-thresh / cls-agnostic deltas at zero-shot inference
    focal_gamma: Optional[float] = None  # MODEL.CLIP.FOCAL_SCALED_LOSS
    bg_loss_weight: Optional[float] = None  # MODEL.CLIP.BG_CLS_LOSS_WEIGHT
    no_box_delta: bool = False  # MODEL.CLIP.NO_BOX_DELTA
    cls_agnostic_bbox_reg: bool = False
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    pixel_mean: Sequence[float] = (0.48145466, 0.4578275, 0.40821073)
    pixel_std: Sequence[float] = (0.26862954, 0.26130258, 0.27577711)
    # offline RPN uses d2/ImageNet pixel stats (reference handles dual
    # normalization when the two towers differ, clip_rcnn.py offline_* paths)
    offline_pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    offline_pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    offline_input_bgr: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.offline_backbone = D2ResNet(
            depth=self.offline_depth, out_features=("res4",), dtype=self.dtype
        )
        self.offline_proposal_generator = RPN(
            in_channels=1024,
            stride=16,
            nms_thresh=self.offline_rpn_nms_thresh,
            post_nms_topk_train=self.rpn_post_nms_topk[0],
            post_nms_topk_test=self.rpn_post_nms_topk[1],
            dtype=self.dtype,
        )
        self.backbone = ModifiedResNet(
            layers=self.backbone_layers,
            output_dim=self.embed_dim,
            heads=self.backbone_width * 32 // 64,
            width=self.backbone_width,
            out_features=("res4",),
            dtype=self.dtype,
        )
        self.roi_heads = CLIPRes5ROIHeads(
            num_classes=self.num_classes,
            use_text_emb=True,
            emb_dim=self.embed_dim,
            temperature=self.temperature,
            focal_gamma=self.focal_gamma,
            bg_loss_weight=self.bg_loss_weight,
            no_box_delta=self.no_box_delta,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            score_thresh_test=self.score_thresh_test,
            nms_thresh_test=self.nms_thresh_test,
            detections_per_image=self.detections_per_image,
            dtype=self.dtype,
        )

    def _norm(self, images, mean, std, bgr=False):
        x = images[..., ::-1] if bgr else images
        m = jnp.asarray(mean, jnp.float32)
        s = jnp.asarray(std, jnp.float32)
        if float(sum(mean)) < 3.0:
            x = x / 255.0
        return ((x - m) / s).astype(self.dtype)

    def _proposals(self, batch: DetBatch, training: bool):
        x_off = self._norm(batch.image, self.offline_pixel_mean, self.offline_pixel_std, self.offline_input_bgr)
        f_off = self.offline_backbone(x_off)["res4"]
        proposals, _ = self.offline_proposal_generator(
            jax.lax.stop_gradient(f_off), batch.image_sizes, training=training, compute_losses=False
        )
        return proposals

    def supervised_losses(self, batch: DetBatch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        proposals = self._proposals(batch, True)
        x = self._norm(batch.image, self.pixel_mean, self.pixel_std)
        features = self.backbone(x)["res4"]
        _, losses = self.roi_heads(
            features, proposals, batch.image_sizes, training=True,
            res5_fn=self.backbone.res5_forward,
            attnpool_fn=self.backbone.attnpool_forward,
            gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
            gt_valid=batch.gt_valid, rng=rng,
        )
        return losses

    def inference(self, batch: DetBatch) -> DetectionResult:
        proposals = self._proposals(batch, False)
        x = self._norm(batch.image, self.pixel_mean, self.pixel_std)
        features = self.backbone(x)["res4"]
        detections, _ = self.roi_heads(
            features, proposals, batch.image_sizes, training=False,
            res5_fn=self.backbone.res5_forward,
            attnpool_fn=self.backbone.attnpool_forward,
        )
        return detections

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.supervised_losses(batch, rng)


class PretrainFastRCNN(nn.Module):
    """Region-language pretraining (reference clip_rcnn.py PretrainFastRCNN):
    image-text matching over the global batch + teacher-distilled
    region-concept matching."""

    backbone_layers: Sequence[int] = (3, 4, 6, 3)
    backbone_width: int = 64
    embed_dim: int = 1024
    concept_dim: int = 1024
    num_concepts: int = 1000
    num_regions: int = 36  # MODEL.CLIP.PRETRAIN_SAMPLE_REGIONS
    concept_thresh: float = 0.1  # MODEL.CLIP.CONCEPT_THRES
    distill_temp: float = 0.01
    # in-graph caption encoder (reference: the lang_encoder of PretrainFastRCNN
    # encodes TSV captions during pretraining, clip_rcnn.py + build.py:312-340)
    text_vocab_size: int = 49408
    text_context_length: int = 77
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # GPipe pipelining of the 12-block text tower (parallel/pp.py):
    # mesh axis name; None/"" = off
    pipeline_axis: Optional[str] = None
    pipeline_microbatches: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        mk = lambda name: ModifiedResNet(
            layers=self.backbone_layers,
            output_dim=self.embed_dim,
            heads=self.backbone_width * 32 // 64,
            width=self.backbone_width,
            out_features=("res4",),
            dtype=self.dtype,
            name=name,
        )
        self.backbone = mk("backbone")
        self.teacher_backbone = mk("teacher_backbone")  # frozen via optimizer mask
        # frozen concept pool embeddings (MODEL.CLIP.CONCEPT_POOL_EMB)
        self.concept_emb = self.param(
            "concept_emb", nn.initializers.normal(0.01), (self.num_concepts, self.concept_dim)
        )
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ()
        )
        self.roi_heads = CLIPRes5ROIHeads(
            num_classes=self.num_concepts, use_text_emb=True, emb_dim=self.embed_dim, dtype=self.dtype
        )
        from .backbone.text_encoder import CLIPTextEncoder

        self.lang_encoder = CLIPTextEncoder(
            embed_dim=self.embed_dim,
            context_length=self.text_context_length,
            vocab_size=self.text_vocab_size,
            width=self.text_width,
            heads=self.text_heads,
            layers=self.text_layers,
            pipeline_axis=self.pipeline_axis or None,
            pipeline_microbatches=self.pipeline_microbatches or None,
            dtype=self.dtype,
        )

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, context_length) int32 BPE tokens -> (B, embed_dim)."""
        return self.lang_encoder(tokens)

    def pretrain_losses_with_text(
        self,
        images224: jnp.ndarray,  # (B, 224, 224, 3) normalized
        region_boxes: jnp.ndarray,  # (B, R, 4)
        text_tokens: jnp.ndarray,  # (B, context_length) int32
    ) -> Dict[str, jnp.ndarray]:
        """The full pretraining step input: captions are encoded IN-GRAPH by
        the frozen lang encoder (reference trains over the TSV corpus with
        the language tower in the loop)."""
        text_embs = jax.lax.stop_gradient(self.encode_text(text_tokens))
        return self.pretrain_losses(images224, region_boxes, text_embs)

    def _region_embed(self, backbone, images224, boxes):
        feats = backbone(images224)["res4"]
        pooled = self.roi_heads.pool(feats, boxes)
        x = backbone.res5_forward(pooled)
        return backbone.attnpool_forward(x)

    def pretrain_losses(
        self,
        images224: jnp.ndarray,  # (B, 224, 224, 3) normalized
        region_boxes: jnp.ndarray,  # (B, R, 4) proposals (from grid or RPN)
        text_embs: jnp.ndarray,  # (B, D) caption embeddings (lang encoder)
    ) -> Dict[str, jnp.ndarray]:
        b, r = region_boxes.shape[:2]
        region_feats = self._region_embed(self.backbone, images224, region_boxes)  # (B*R, D)
        region_feats = region_feats / jnp.maximum(
            jnp.linalg.norm(region_feats.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        )
        text = text_embs / jnp.maximum(
            jnp.linalg.norm(text_embs.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
        )

        # image-text matching: average region embedding vs caption, InfoNCE
        # over the global batch (clip_rcnn.py image-text level; gather ==
        # global-view jit)
        img_emb = jnp.mean(region_feats.reshape(b, r, -1), axis=1)
        img_emb = img_emb / jnp.maximum(jnp.linalg.norm(img_emb, axis=-1, keepdims=True), 1e-12)
        scale = jnp.exp(self.logit_scale)
        logits = scale * img_emb @ text.T
        labels = jnp.arange(b)
        ce_a = -jax.nn.log_softmax(logits, axis=1)[labels, labels].mean()
        ce_b = -jax.nn.log_softmax(logits.T, axis=1)[labels, labels].mean()
        losses = {"img_txt_loss": (ce_a + ce_b) / 2.0}

        # MIL: each region should match its own image's caption among the batch
        region_text_logits = scale * region_feats @ text.T  # (B*R, B)
        bag = jnp.repeat(jnp.eye(b), r, axis=0)
        losses["region_txt_mil_loss"] = mil_cross_entropy(region_text_logits, bag)

        # teacher-distilled region-concept matching
        # (get_psuedo_concept_labels: teacher softmax over concept pool)
        teacher_feats = self._region_embed(self.teacher_backbone, images224, region_boxes)
        teacher_feats = jax.lax.stop_gradient(
            teacher_feats / jnp.maximum(jnp.linalg.norm(teacher_feats.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)
        )
        concepts = self.concept_emb / jnp.maximum(
            jnp.linalg.norm(self.concept_emb, axis=-1, keepdims=True), 1e-12
        )
        teacher_scores = jax.nn.softmax(teacher_feats @ concepts.T / self.distill_temp, axis=-1)
        keep = jnp.max(teacher_scores, axis=-1) > self.concept_thresh
        student_logits = region_feats @ concepts.T / self.distill_temp
        per_region = jnp.sum(-teacher_scores * jax.nn.log_softmax(student_logits, -1), axis=-1)
        losses["concept_distill_loss"] = jnp.sum(per_region * keep) / jnp.maximum(jnp.sum(keep), 1.0)
        return losses
