"""Remaining meta-architectures for inventory parity (reference
detectron2/modeling/meta_arch/: ProposalNetwork rcnn.py:788,
SemanticSegmentor semantic_seg.py:250, keypoint head
roi_heads/keypoint_head.py:272). None are on the CDDMSL path."""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbone.clip_resnet import ModifiedResNet
from .backbone.resnet import D2ResNet, FPN
from .rcnn import DetBatch
from .rpn import RPN, Proposals


def _proposals_as_detections(proposals: Proposals):
    """Proposals -> class-0 DetectionResult ordered by objectness (the
    reference ProposalNetwork emits 'proposals' Instances with
    objectness_logits, rcnn.py:788-936; the trainer/eval protocol consumes
    DetectionResult, so proposals ride as class-agnostic detections with
    sigmoid(objectness) scores)."""
    from .fast_rcnn import DetectionResult

    return DetectionResult(
        boxes=proposals.boxes,
        scores=jax.nn.sigmoid(proposals.scores) * proposals.valid,
        classes=jnp.zeros(proposals.scores.shape, jnp.int32),
        valid=proposals.valid,
    )


class ProposalNetwork(nn.Module):
    """Backbone + RPN only — emits proposals as 'detections'
    (reference meta_arch/rcnn.py:788-936)."""

    depth: int = 50
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = D2ResNet(depth=self.depth, out_features=("res4",), dtype=self.dtype)
        self.proposal_generator = RPN(in_channels=1024, stride=16, dtype=self.dtype)

    def _norm(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.dtype)

    def losses(self, batch: DetBatch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        f = self.backbone(self._norm(batch.image))["res4"]
        _, losses = self.proposal_generator(
            f, batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=rng,
        )
        return losses

    def inference(self, batch: DetBatch):
        f = self.backbone(self._norm(batch.image))["res4"]
        proposals, _ = self.proposal_generator(f, batch.image_sizes, training=False)
        return _proposals_as_detections(proposals)

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    # ---- trainer protocol (engine/defaults.py DefaultTrainer) ----
    def init_all(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    def cddmsl_losses(self, batch: DetBatch, rng: jax.Array, caption_on=None,
                      kd_regularization: bool = True, enable_caption: bool = True):
        del caption_on, kd_regularization, enable_caption
        return self.losses(batch, rng)


class FPNProposalNetwork(nn.Module):
    """FPN variant of ProposalNetwork (reference rpn_R_50_FPN_1x.yaml:
    META_ARCHITECTURE=ProposalNetwork on Base-RCNN-FPN — FPN backbone +
    the shared multi-level RPN, proposals emitted as 'detections')."""

    depth: int = 50
    fpn_out_channels: int = 256
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    pre_nms_topk: Tuple[int, int] = (2000, 1000)
    post_nms_topk: Tuple[int, int] = (1000, 2000)  # d2 rpn_*.yaml: 2000 at test
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    backbone_width: int = 0  # compile-light override (tests)
    dtype: Any = jnp.float32

    def setup(self):
        from .rpn import FPNRPN

        self.backbone = D2ResNet(
            depth=self.depth, out_features=("res2", "res3", "res4", "res5"),
            width_per_group=self.backbone_width or 64, dtype=self.dtype,
        )
        self.fpn = FPN(
            in_features=("res2", "res3", "res4", "res5"),
            out_channels=self.fpn_out_channels, top_block_p6=True, dtype=self.dtype,
        )
        self.proposal_generator = FPNRPN(
            in_channels=self.fpn_out_channels,
            strides=(4, 8, 16, 32, 64),
            anchor_sizes=tuple(self.anchor_sizes),
            pre_nms_topk_train=self.pre_nms_topk[0],
            pre_nms_topk_test=self.pre_nms_topk[1],
            post_nms_topk_train=self.post_nms_topk[0],
            post_nms_topk_test=self.post_nms_topk[1],
            dtype=self.dtype,
        )

    def _norm(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.dtype)

    def _levels(self, images):
        feats = self.fpn(self.backbone(self._norm(images)))
        return [feats[f"p{i}"] for i in range(2, 7)]

    def losses(self, batch: DetBatch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        _, losses = self.proposal_generator(
            self._levels(batch.image), batch.image_sizes, training=True,
            gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid, rng=rng,
        )
        return losses

    def inference(self, batch: DetBatch):
        proposals, _ = self.proposal_generator(
            self._levels(batch.image), batch.image_sizes, training=False
        )
        return _proposals_as_detections(proposals)

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    # ---- trainer protocol (engine/defaults.py DefaultTrainer) ----
    def init_all(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    def cddmsl_losses(self, batch: DetBatch, rng: jax.Array, caption_on=None,
                      kd_regularization: bool = True, enable_caption: bool = True):
        del caption_on, kd_regularization, enable_caption
        return self.losses(batch, rng)


class SemSegFPNHead(nn.Module):
    """FPN semantic head (reference semantic_seg.py SemSegFPNHead): per-level
    conv stacks upsampled to 1/4 scale, summed, 1x1 predictor."""

    num_classes: int
    conv_dim: int = 128
    common_stride: int = 4
    strides: Sequence[int] = (4, 8, 16, 32)
    norm: str = ""  # MODEL.SEM_SEG_HEAD.NORM ("" | "GN"); reference default GN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> jnp.ndarray:
        from .backbone.batch_norm import GroupNorm32

        def block(x, i, u):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=(self.norm == ""),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"head_{i}_conv{u}")(x)
            if self.norm == "GN":
                x = GroupNorm32(self.conv_dim, dtype=self.dtype, name=f"head_{i}_gn{u}")(x)
            return nn.relu(x)

        out = None
        for i, (f, stride) in enumerate(zip(features, self.strides)):
            x = f.astype(self.dtype)
            n_up = (stride // self.common_stride).bit_length() - 1  # log2
            x = block(x, i, 0)
            for u in range(n_up):
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
                if u < n_up - 1:
                    x = block(x, i, u + 1)
            out = x if out is None else out + x
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="predictor")(out).astype(jnp.float32)


class SemanticSegmentor(nn.Module):
    """reference meta_arch/semantic_seg.py:250 — FPN backbone + SemSegFPNHead,
    per-pixel CE with an ignore label."""

    num_classes: int = 54
    depth: int = 50
    ignore_value: int = 255
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")  # SEM_SEG_HEAD.IN_FEATURES
    head_norm: str = ""  # SEM_SEG_HEAD.NORM
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = D2ResNet(depth=self.depth, out_features=("res2", "res3", "res4", "res5"), dtype=self.dtype)
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"), top_block_p6=False, dtype=self.dtype)
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32}
        self.sem_seg_head = SemSegFPNHead(
            num_classes=self.num_classes,
            strides=tuple(strides[f] for f in self.in_features),
            norm=self.head_norm,
            dtype=self.dtype,
        )

    def _forward_logits(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = ((images - mean) / std).astype(self.dtype)
        feats = self.fpn(self.backbone(x))
        levels = [feats[k] for k in self.in_features]
        logits = self.sem_seg_head(levels)
        b, h, w, c = logits.shape
        H, W = images.shape[1], images.shape[2]
        return jax.image.resize(logits, (b, H, W, c), method="bilinear")

    def losses(self, images: jnp.ndarray, sem_seg_gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        logits = self._forward_logits(images)
        valid = sem_seg_gt != self.ignore_value
        gt = jnp.where(valid, sem_seg_gt, 0)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, gt[..., None], axis=-1)[..., 0]
        return {"loss_sem_seg": jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)}

    def inference(self, batch_or_images) -> jnp.ndarray:
        images = getattr(batch_or_images, "image", batch_or_images)
        return jnp.argmax(self._forward_logits(images), axis=-1)

    def __call__(self, images: jnp.ndarray, sem_seg_gt: jnp.ndarray):
        return self.losses(images, sem_seg_gt)

    # ---- trainer protocol (engine/train_loop.py make_train_step /
    # engine/defaults.py DefaultTrainer) ----
    def init_all(self, batch: DetBatch, rng: jax.Array):
        del rng
        sem = (
            batch.sem_seg
            if batch.sem_seg is not None
            else jnp.zeros(batch.image.shape[:3], jnp.int32)
        )
        return self.losses(batch.image, sem)

    def cddmsl_losses(
        self, batch: DetBatch, rng: jax.Array, caption_on=None,
        kd_regularization: bool = True, enable_caption: bool = True,
    ):
        del rng, caption_on, kd_regularization, enable_caption
        assert batch.sem_seg is not None, (
            "SemanticSegmentor training needs DetBatch.sem_seg (register a "
            "sem-seg dataset — the loader selects SemSegDatasetMapper)"
        )
        return self.losses(batch.image, batch.sem_seg)


# Keypoint head/assembly moved to models/keypoint_head.py (mirrors the
# reference file layout); re-exported here for compatibility.
from .keypoint_head import (  # noqa: E402,F401
    KRCNNConvDeconvUpsampleHead,
    KeypointROIHeads,
    keypoint_rcnn_loss,
)
