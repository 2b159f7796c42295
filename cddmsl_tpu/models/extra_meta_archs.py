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

    def inference(self, batch: DetBatch) -> Proposals:
        f = self.backbone(self._norm(batch.image))["res4"]
        proposals, _ = self.proposal_generator(f, batch.image_sizes, training=False)
        return proposals

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)


class SemSegFPNHead(nn.Module):
    """FPN semantic head (reference semantic_seg.py SemSegFPNHead): per-level
    conv stacks upsampled to 1/4 scale, summed, 1x1 predictor."""

    num_classes: int
    conv_dim: int = 128
    common_stride: int = 4
    strides: Sequence[int] = (4, 8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> jnp.ndarray:
        out = None
        for i, (f, stride) in enumerate(zip(features, self.strides)):
            x = f.astype(self.dtype)
            n_up = (stride // self.common_stride).bit_length() - 1  # log2
            x = nn.relu(
                nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"head_{i}_conv0")(x)
            )
            for u in range(n_up):
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
                if u < n_up - 1:
                    x = nn.relu(
                        nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                                param_dtype=jnp.float32, name=f"head_{i}_conv{u+1}")(x)
                    )
            out = x if out is None else out + x
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="predictor")(out).astype(jnp.float32)


class SemanticSegmentor(nn.Module):
    """reference meta_arch/semantic_seg.py:250 — FPN backbone + SemSegFPNHead,
    per-pixel CE with an ignore label."""

    num_classes: int = 54
    depth: int = 50
    ignore_value: int = 255
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = D2ResNet(depth=self.depth, out_features=("res2", "res3", "res4", "res5"), dtype=self.dtype)
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"), top_block_p6=False, dtype=self.dtype)
        self.sem_seg_head = SemSegFPNHead(num_classes=self.num_classes, dtype=self.dtype)

    def _forward_logits(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = ((images - mean) / std).astype(self.dtype)
        feats = self.fpn(self.backbone(x))
        levels = [feats[k] for k in sorted(feats.keys())]
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

    def inference(self, images: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self._forward_logits(images), axis=-1)

    def __call__(self, images: jnp.ndarray, sem_seg_gt: jnp.ndarray):
        return self.losses(images, sem_seg_gt)


class KRCNNConvDeconvUpsampleHead(nn.Module):
    """Keypoint head (reference roi_heads/keypoint_head.py:272): 8 convs +
    deconv + 2x upsample producing per-keypoint heatmaps; CE over flattened
    heatmap positions of visible keypoints."""

    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, c in enumerate(self.conv_dims):
            x = nn.relu(nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name=f"conv_fcn{i+1}")(x))
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2), dtype=self.dtype, param_dtype=jnp.float32, name="score_lowres")(x)
        b, h, w, k = x.shape
        return jax.image.resize(x.astype(jnp.float32), (b, h * 2, w * 2, k), method="bilinear")


def keypoint_rcnn_loss(
    heatmaps: jnp.ndarray,  # (N, S, S, K) logits
    kp_positions: jnp.ndarray,  # (N, K) int flat target index in S*S
    kp_visible: jnp.ndarray,  # (N, K) bool
) -> jnp.ndarray:
    n, s, _, k = heatmaps.shape
    flat = heatmaps.reshape(n, s * s, k)
    lp = jax.nn.log_softmax(flat, axis=1)
    tgt = jnp.clip(kp_positions, 0, s * s - 1)
    nll = -jnp.take_along_axis(lp, tgt[:, None, :], axis=1)[:, 0, :]
    m = kp_visible.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


class KeypointROIHeads(nn.Module):
    """Keypoint RoI-heads ASSEMBLY (reference roi_heads.py StandardROIHeads
    `_forward_keypoint` + keypoint_head.py): pool sampled boxes, run the
    KRCNN head, convert GT keypoints (image coords + visibility) into heatmap
    targets in box coordinates, CE loss over visible keypoints; inference
    decodes heatmap argmax back to image coordinates."""

    num_keypoints: int = 17
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16
    conv_dims: Sequence[int] = (512,) * 8
    dtype: Any = jnp.float32

    def setup(self):
        self.keypoint_head = KRCNNConvDeconvUpsampleHead(
            num_keypoints=self.num_keypoints, conv_dims=self.conv_dims, dtype=self.dtype
        )

    def _pool(self, features, boxes):
        from ..ops.roi_align import roi_align

        b, s = boxes.shape[:2]
        pooled = jax.vmap(
            lambda f, bx: roi_align(
                f, bx, (self.pooler_resolution, self.pooler_resolution), self.pooler_scale, 2, True
            )
        )(features, boxes)
        return pooled.reshape(b * s, self.pooler_resolution, self.pooler_resolution, -1)

    @staticmethod
    def keypoints_to_heatmap_targets(keypoints, boxes, heatmap_size):
        """(N, K, 3) image-coord keypoints (x, y, vis) x (N, 4) boxes ->
        (N, K) flat heatmap indices + (N, K) validity (reference
        structures/keypoints.py _keypoints_to_heatmap)."""
        x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
        x2, y2 = boxes[:, 2:3], boxes[:, 3:4]
        w = jnp.maximum(x2 - x1, 1e-4)
        h = jnp.maximum(y2 - y1, 1e-4)
        sx = heatmap_size / w
        sy = heatmap_size / h
        kx = jnp.floor((keypoints[..., 0] - x1) * sx).astype(jnp.int32)
        ky = jnp.floor((keypoints[..., 1] - y1) * sy).astype(jnp.int32)
        # reference _keypoints_to_heatmap: boundary coordinates (x == x2)
        # clamp into the last bin and stay VISIBLE; validity is in COORD space
        kx = jnp.clip(kx, 0, heatmap_size - 1)
        ky = jnp.clip(ky, 0, heatmap_size - 1)
        inside = (
            (keypoints[..., 0] >= x1) & (keypoints[..., 0] <= x2)
            & (keypoints[..., 1] >= y1) & (keypoints[..., 1] <= y2)
        )
        vis = (keypoints[..., 2] > 0) & inside
        pos = ky * heatmap_size + kx
        return pos, vis

    def losses(self, features, boxes, fg_valid, gt_keypoints):
        """features (B,H,W,C), boxes (B,S,4), fg_valid (B,S),
        gt_keypoints (B,S,K,3) matched per sampled box."""
        b, s = boxes.shape[:2]
        heat = self.keypoint_head(self._pool(features, boxes))  # (B*S, S2, S2, K)
        size = heat.shape[1]
        pos, vis = self.keypoints_to_heatmap_targets(
            gt_keypoints.reshape(b * s, self.num_keypoints, 3), boxes.reshape(b * s, 4), size
        )
        vis = vis & fg_valid.reshape(b * s)[:, None]
        return {"loss_keypoint": keypoint_rcnn_loss(heat, pos, vis)}

    def inference(self, features, boxes):
        """boxes (B,D,4) -> (B, D, K, 3) decoded (x, y, score)."""
        b, d = boxes.shape[:2]
        heat = self.keypoint_head(self._pool(features, boxes))  # (B*D, S2, S2, K)
        n, size, _, k = heat.shape
        flat = heat.reshape(n, size * size, k)
        idx = jnp.argmax(flat, axis=1)  # (N, K)
        score = jax.nn.softmax(flat, axis=1)
        score = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0, :]
        ky, kx = idx // size, idx % size
        bx = boxes.reshape(n, 4)
        x1, y1 = bx[:, 0:1], bx[:, 1:2]
        w = jnp.maximum(bx[:, 2:3] - x1, 1e-4)
        h = jnp.maximum(bx[:, 3:4] - y1, 1e-4)
        px = x1 + (kx + 0.5) * w / size
        py = y1 + (ky + 0.5) * h / size
        return jnp.stack([px, py, score], axis=-1).reshape(b, d, k, 3)
