"""RetinaNet meta-architecture (reference detectron2/modeling/meta_arch/
retinanet.py, 609 LoC): single-stage detector over FPN p3-p7 with shared
4-conv cls/box towers, focal loss, smooth-L1 box regression, and per-level
top-k + class-aware NMS inference — static-shape throughout.

Not used by the CDDMSL recipes; provided for meta-architecture parity.
"""

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import anchor_grid, generate_cell_anchors
from ..ops.box_regression import Box2BoxTransform
from ..ops.nms import batched_nms
from ..structures import boxes as box_ops
from .backbone.resnet import D2ResNet, FPN
from .fast_rcnn import DetectionResult
from .matcher import Matcher
from .rcnn import DetBatch
from .rpn import smooth_l1


class RetinaNetHead(nn.Module):
    num_classes: int
    num_anchors: int
    conv_dims: Sequence[int] = (256, 256, 256, 256)
    prior_prob: float = 0.01
    norm: str = ""  # MODEL.RETINANET.NORM ("" | "GN"), conv->norm->relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        cls_convs = [
            nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name=f"cls_conv{i}")
            for i, c in enumerate(self.conv_dims)
        ]
        box_convs = [
            nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name=f"box_conv{i}")
            for i, c in enumerate(self.conv_dims)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            bias_init=bias_init, dtype=self.dtype, param_dtype=jnp.float32, name="cls_score",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name="bbox_pred",
        )
        def _gn(i, tower):
            from .backbone.batch_norm import GroupNorm32

            return GroupNorm32(
                self.conv_dims[i], dtype=self.dtype, name=f"{tower}_gn{i}"
            )

        logits, deltas = [], []
        for f in features:
            c = f
            for i, conv in enumerate(cls_convs):
                c = conv(c)
                if self.norm == "GN":
                    c = _gn(i, "cls")(c)
                c = nn.relu(c)
            logits.append(cls_score(c))
            b = f
            for i, conv in enumerate(box_convs):
                b = conv(b)
                if self.norm == "GN":
                    b = _gn(i, "box")(b)
                b = nn.relu(b)
            deltas.append(bbox_pred(b))
        return logits, deltas


class RetinaNet(nn.Module):
    num_classes: int = 80
    depth: int = 50
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    # [x, x*2^(1/3), x*2^(2/3)] per octave (reference Base-RetinaNet.yaml's
    # unsafe-eval anchor expression, expanded)
    anchor_sizes: Sequence[Sequence[float]] = tuple(
        tuple(s * 2.0 ** (k / 3.0) for k in range(3)) for s in (32, 64, 128, 256, 512)
    )
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    iou_thresholds: Sequence[float] = (0.4, 0.5)
    iou_labels: Sequence[int] = (0, -1, 1)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    box_reg_loss_type: str = "smooth_l1"  # MODEL.RETINANET.BBOX_REG_LOSS_TYPE
    head_norm: str = ""  # MODEL.RETINANET.NORM
    # reference retinanet.py:154-155 — losses are normalized by an EMA of
    # the per-step foreground-anchor count (init 100, momentum 0.9), carried
    # here as a 'batch_stats' variable the train step threads through
    loss_normalizer_momentum: float = 0.9
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    topk_candidates: int = 1000
    detections_per_image: int = 100
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    backbone_width: int = 0  # width_per_group override for tiny test nets
    res2_out_channels: int = 256
    fpn_out_channels: int = 256
    head_conv_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = D2ResNet(
            depth=self.depth, out_features=("res3", "res4", "res5"),
            width_per_group=self.backbone_width or 64,
            res2_out_channels=self.res2_out_channels, dtype=self.dtype,
        )
        # reference build_retinanet_resnet_fpn_backbone: LastLevelP6P7 learned
        # stride-2 convs fed from res5 (NOT a maxpool like Base-RCNN-FPN's p6)
        self.fpn = FPN(
            in_features=("res3", "res4", "res5"), out_channels=self.fpn_out_channels,
            top_block_p6=False, top_block="p6p7", dtype=self.dtype,
        )
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.anchor_sizes[0]) * len(self.aspect_ratios),
            conv_dims=tuple(self.head_conv_dims) if self.head_conv_dims
            else (self.fpn_out_channels,) * 4,
            norm=self.head_norm,
            dtype=self.dtype,
        )
        self.box2box = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
        self.matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels),
            allow_low_quality_matches=True,
        )
        # EMA foreground-count loss normalizer (reference retinanet.py:154)
        self._loss_normalizer = self.variable(
            "batch_stats", "loss_normalizer",
            lambda: jnp.asarray(100.0, jnp.float32),
        )

    def _features(self, images: jnp.ndarray):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = ((images - mean) / std).astype(self.dtype)
        feats = self.fpn(self.backbone(x))
        # p3, p4, p5 from the pyramid + the learned p6/p7 top block — five
        # levels at strides 8..128 (reference retinanet.py in_features)
        levels = [feats[k] for k in sorted(feats.keys())]
        assert len(levels) == len(self.strides)
        return levels

    def _anchors(self, shapes):
        out = []
        for (h, w), stride, sizes in zip(shapes, self.strides, self.anchor_sizes):
            cell = generate_cell_anchors(tuple(sizes), tuple(self.aspect_ratios))
            out.append(anchor_grid(h, w, stride, cell))
        return jnp.concatenate(out, axis=0)

    def losses(self, batch: DetBatch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        levels = self._features(batch.image)
        logits_l, deltas_l = self.head(levels)
        b = batch.image.shape[0]
        logits = jnp.concatenate(
            [l.reshape(b, -1, self.num_classes).astype(jnp.float32) for l in logits_l], axis=1
        )
        deltas = jnp.concatenate([d.reshape(b, -1, 4).astype(jnp.float32) for d in deltas_l], axis=1)
        anchors = self._anchors([l.shape[1:3] for l in levels])

        def per_image(logit, delta, gtb, gtc, gtv):
            iou = box_ops.pairwise_iou(gtb, anchors)
            matched_idxs, match_labels = self.matcher(iou, gtv)
            fg = match_labels == 1
            valid = match_labels != -1
            gt_cls = jnp.where(fg, gtc[matched_idxs], self.num_classes)
            onehot = jax.nn.one_hot(gt_cls, self.num_classes)  # bg row -> all zeros
            p = jax.nn.sigmoid(logit)
            ce = jnp.maximum(logit, 0) - logit * onehot + jnp.log1p(jnp.exp(-jnp.abs(logit)))
            p_t = p * onehot + (1 - p) * (1 - onehot)
            alpha_t = self.focal_alpha * onehot + (1 - self.focal_alpha) * (1 - onehot)
            focal = alpha_t * ((1 - p_t) ** self.focal_gamma) * ce
            cls_loss = jnp.sum(focal * valid[:, None])
            if self.box_reg_loss_type == "giou":
                # reference _dense_box_regression_loss giou path: decode the
                # predicted deltas against the anchors, 1 - GIoU vs matched GT
                pred = self.box2box.apply_deltas(delta, anchors)
                reg = jnp.sum((1.0 - box_ops.pairwise_giou(pred, gtb[matched_idxs])) * fg)
            else:
                gt_deltas = self.box2box.get_deltas(anchors, gtb[matched_idxs])
                reg = jnp.sum(smooth_l1(delta, gt_deltas, self.smooth_l1_beta) * fg[:, None])
            return cls_loss, reg, jnp.sum(fg)

        cls, reg, nfg = jax.vmap(per_image)(logits, deltas, batch.gt_boxes, batch.gt_classes, batch.gt_valid)
        # EMA loss normalizer (reference retinanet.py:316-318): updated with
        # max(num_pos_anchors, 1) THEN used to divide this step's losses
        ema = self._loss_normalizer
        m = self.loss_normalizer_momentum
        norm = m * ema.value + (1.0 - m) * jnp.maximum(jnp.sum(nfg).astype(jnp.float32), 1.0)
        if self.is_mutable_collection("batch_stats"):
            ema.value = norm
        return {"loss_cls": jnp.sum(cls) / norm, "loss_box_reg": jnp.sum(reg) / norm}

    def inference(self, batch: DetBatch) -> DetectionResult:
        levels = self._features(batch.image)
        logits_l, deltas_l = self.head(levels)
        b = batch.image.shape[0]
        shapes = [l.shape[1:3] for l in levels]

        # candidate selection is PER LEVEL (reference retinanet.py
        # inference_single_image: topk_candidates + score filter on EACH
        # level, then the merged candidates go through one batched NMS) —
        # a global top-k would let a dense low-resolution level's noise
        # crowd out sparse high-resolution candidates
        cand_b, cand_s, cand_c = [], [], []
        for logit_map, delta_map, (h, w), stride, sizes in zip(
            logits_l, deltas_l, shapes, self.strides, self.anchor_sizes
        ):
            cell = generate_cell_anchors(tuple(sizes), tuple(self.aspect_ratios))
            anchors = anchor_grid(h, w, stride, cell)
            logit = logit_map.reshape(b, -1, self.num_classes).astype(jnp.float32)
            delta = delta_map.reshape(b, -1, 4).astype(jnp.float32)
            k = min(self.topk_candidates, logit.shape[1] * self.num_classes)

            def per_image(lg, dl, anchors=anchors, k=k):
                probs = jax.nn.sigmoid(lg).reshape(-1)
                # topk-then-threshold == the reference's threshold-then-topk
                # (inference_single_image:453-462): sub-threshold entries are
                # at the bottom of any top-k, so zeroing them after selection
                # keeps the identical candidate set
                top_p, top_i = jax.lax.top_k(probs, k)
                a_idx = top_i // self.num_classes
                cls = (top_i % self.num_classes).astype(jnp.int32)
                # NO clipping here — the reference NMSes the raw decoded
                # boxes and clips only in detector_postprocess
                boxes = self.box2box.apply_deltas(dl[a_idx], anchors[a_idx])
                return boxes, jnp.where(top_p > self.score_thresh, top_p, 0.0), cls

            bx, sc, cl = jax.vmap(per_image)(logit, delta)
            cand_b.append(bx)
            cand_s.append(sc)
            cand_c.append(cl)

        boxes_all = jnp.concatenate(cand_b, axis=1)
        scores_all = jnp.concatenate(cand_s, axis=1)
        cls_all = jnp.concatenate(cand_c, axis=1)

        def nms_per_image(bx, sc, cl):
            idx, valid = batched_nms(
                bx, sc, cl, self.nms_thresh, self.detections_per_image, valid=sc > 0
            )
            return DetectionResult(bx[idx], jnp.where(valid, sc[idx], 0.0), cl[idx], valid)

        det = jax.vmap(nms_per_image)(boxes_all, scores_all, cls_all)
        # detector_postprocess: rescale to the original image size
        # (reference meta_arch/retinanet.py forward_inference + postprocess)
        scale = (batch.orig_sizes / jnp.maximum(batch.image_sizes, 1)).astype(jnp.float32)
        sxy = jnp.stack([scale[:, 1], scale[:, 0], scale[:, 1], scale[:, 0]], axis=-1)
        boxes = det.boxes * sxy[:, None, :]
        boxes = jax.vmap(lambda bx, hw: box_ops.clip(bx, (hw[0], hw[1])))(boxes, batch.orig_sizes)
        return det._replace(boxes=boxes)

    def __call__(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    # ---- trainer protocol (engine/train_loop.py make_train_step) ----
    def init_all(self, batch: DetBatch, rng: jax.Array):
        return self.losses(batch, rng)

    def cddmsl_losses(self, batch: DetBatch, rng: jax.Array, caption_on=None,
                      kd_regularization: bool = True, enable_caption: bool = True):
        del caption_on, kd_regularization, enable_caption
        return self.losses(batch, rng)
