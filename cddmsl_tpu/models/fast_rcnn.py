"""Fast R-CNN output layers: text-embedding cosine classifier, losses, and
static-shape inference.

Re-implements the reference FastRCNNOutputLayers (detectron2/modeling/
roi_heads/fast_rcnn.py:440-683) and fast_rcnn_inference (:47-227):
  * when `use_text_emb`, classifier weights are frozen CLIP text embeddings,
    bias-free cosine similarity / temperature (CLSS_TEMP), and the background
    logit is a frozen zero-vector row -> constant 0 before temperature
    (fast_rcnn.py:547-570)
  * focal-scaled CE (gamma = MODEL.CLIP.FOCAL_SCALED_LOSS) with an optional
    background-class weight (fast_rcnn.py:624-644)
  * smooth-L1 / GIoU box loss over fg proposals, normalized by the total
    sampled count (fast_rcnn.py:646-683)
  * inference: per-class score threshold -> class-aware NMS -> top-k, all on
    fixed-capacity padded arrays.
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.box_regression import Box2BoxTransform
from ..ops.nms import batched_nms
from ..structures import boxes as box_ops
from .rpn import smooth_l1


class FastRCNNOutputLayers(nn.Module):
    num_classes: int
    input_size: int = 1024
    use_text_emb: bool = True
    temperature: float = 0.01
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, D) region features -> (scores (N, K+1) fp32, deltas (N, K*4))."""
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        k = self.num_classes

        if self.use_text_emb:
            # frozen text-embedding rows; loaded from TEXT_EMB_PATH by the
            # checkpointer, excluded from the optimizer by path mask
            w = self.param(
                "cls_score_weight", nn.initializers.normal(0.01), (k, self.input_size)
            )
            xn = x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=1, keepdims=True), 1e-12)
            wn = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
            cls_scores = xn @ wn.T  # (N, K) cosine
            bg = jnp.zeros((x.shape[0], 1), cls_scores.dtype)  # frozen zero emb
            scores = jnp.concatenate([cls_scores, bg], axis=1) / self.temperature
        else:
            scores = nn.Dense(
                k + 1, dtype=self.dtype, param_dtype=jnp.float32, name="cls_score"
            )(x).astype(jnp.float32)

        out_dim = 4 if self.cls_agnostic_bbox_reg else k * 4
        deltas = nn.Dense(
            out_dim,
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bbox_pred",
        )(x).astype(jnp.float32)
        return scores, deltas


def fast_rcnn_losses(
    scores: jnp.ndarray,  # (N, K+1)
    deltas: jnp.ndarray,  # (N, K*4) or (N, 4)
    proposal_boxes: jnp.ndarray,  # (N, 4)
    gt_boxes: jnp.ndarray,  # (N, 4) matched gt per proposal
    gt_classes: jnp.ndarray,  # (N,) in [0, K] (K = background)
    valid: jnp.ndarray,  # (N,) sampled-proposal validity
    num_classes: int,
    box2box: Box2BoxTransform,
    smooth_l1_beta: float = 0.0,
    box_reg_loss_type: str = "smooth_l1",
    box_reg_loss_weight: float = 1.0,
    focal_gamma: Optional[float] = None,
    bg_loss_weight: Optional[float] = None,
) -> Dict[str, jnp.ndarray]:
    """Classification + box regression losses over (padded) sampled proposals.

    Deviation from the reference: means are over valid rows (the reference
    divides by the fixed sample count; identical whenever the sampler fills
    its quota, which it essentially always does with 2000 input proposals).
    """
    n = scores.shape[0]
    valid_f = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)

    # ---- classification ----
    gt_safe = jnp.where(valid, gt_classes, num_classes)
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(log_probs, gt_safe[:, None], axis=1)[:, 0]
    if focal_gamma is not None:
        p_t = jnp.exp(-ce)
        ce = ce * (1.0 - p_t) ** focal_gamma
    if bg_loss_weight is not None:
        w = jnp.where(gt_safe == num_classes, bg_loss_weight, 1.0)
        ce = ce * w
    loss_cls = jnp.sum(ce * valid_f) / n_valid

    # ---- box regression (fg only, normalized by total sampled) ----
    fg = valid & (gt_classes >= 0) & (gt_classes < num_classes)
    if deltas.shape[1] == 4:
        fg_deltas = deltas
    else:
        d = deltas.reshape(n, num_classes, 4)
        fg_cls = jnp.clip(gt_classes, 0, num_classes - 1)
        fg_deltas = jnp.take_along_axis(d, fg_cls[:, None, None], axis=1)[:, 0]
    if box_reg_loss_type == "smooth_l1":
        gt_deltas = box2box.get_deltas(proposal_boxes, gt_boxes)
        reg = jnp.sum(smooth_l1(fg_deltas, gt_deltas, smooth_l1_beta), axis=1)
    elif box_reg_loss_type == "giou":
        fg_boxes = box2box.apply_deltas(fg_deltas, proposal_boxes)
        reg = 1.0 - box_ops.pairwise_giou(fg_boxes, gt_boxes)
    else:
        raise ValueError(box_reg_loss_type)
    loss_box = jnp.sum(reg * fg.astype(jnp.float32)) / n_valid * box_reg_loss_weight
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


class DetectionResult(NamedTuple):
    boxes: jnp.ndarray  # (D, 4)
    scores: jnp.ndarray  # (D,)
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool
    # (D, M, M) box-space mask probabilities (MASK_ON eval only); pasted to
    # image space by the evaluator/postprocess on host
    masks: Optional[jnp.ndarray] = None
    # (D, K, 3) decoded (x, y, score) keypoints (KEYPOINT_ON eval only;
    # reference structures/keypoints.py heatmaps_to_keypoints)
    keypoints: Optional[jnp.ndarray] = None


def fast_rcnn_inference_single_image(
    scores: jnp.ndarray,  # (R, K+1) raw logits
    deltas: jnp.ndarray,  # (R, K*4) or (R, 4)
    proposal_boxes: jnp.ndarray,  # (R, 4)
    proposal_valid: jnp.ndarray,  # (R,)
    image_hw: jnp.ndarray,  # (2,)
    box2box: Box2BoxTransform,
    num_classes: int,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    topk_per_image: int = 100,
    max_candidates: int = 2048,
    no_box_delta: bool = False,
    rpn_scores: Optional[jnp.ndarray] = None,
    multiply_rpn_score: bool = False,
    soft_nms_enabled: bool = False,
    soft_nms_method: str = "gaussian",
    soft_nms_sigma: float = 0.5,
    soft_nms_prune: float = 0.001,
) -> DetectionResult:
    """Static-shape fast_rcnn_inference (reference fast_rcnn.py:130-227):
    softmax -> drop bg -> per-class threshold -> take top `max_candidates`
    (replaces the dynamic `nonzero`) -> class-aware NMS -> top-k."""
    r = scores.shape[0]
    probs = jax.nn.softmax(scores, axis=-1)[:, :-1]  # (R, K)
    if multiply_rpn_score and rpn_scores is not None:
        # reference fast_rcnn.py:707-710: multiply the RAW objectness logit
        # (not a sigmoid probability) and sqrt. Proposals with negative
        # objectness go NaN and are dropped below (cand_valid: NaN > thresh
        # is False), reproducing the reference's torch.isfinite row filter
        # (fast_rcnn.py:153-157). Verified against the reference's own code
        # in tests/test_reference_fast_rcnn_oracle.py.
        probs = jnp.sqrt(probs * rpn_scores[:, None])

    if no_box_delta:
        boxes = jnp.broadcast_to(proposal_boxes[:, None, :], (r, num_classes, 4))
    elif deltas.shape[1] == 4:
        boxes = jnp.broadcast_to(
            box2box.apply_deltas(deltas, proposal_boxes)[:, None, :], (r, num_classes, 4)
        )
    else:
        d = deltas.reshape(r, num_classes, 4)
        boxes = jax.vmap(box2box.apply_deltas, in_axes=(1, None), out_axes=1)(d, proposal_boxes)
    boxes = box_ops.clip(boxes, (image_hw[0], image_hw[1]))

    cand_valid = (
        (probs > score_thresh)
        & proposal_valid[:, None]
        & jnp.all(jnp.isfinite(boxes), axis=-1)
    )  # (R, K)
    flat_scores = jnp.where(cand_valid, probs, 0.0).reshape(-1)
    flat_boxes = boxes.reshape(-1, 4)
    flat_classes = jnp.broadcast_to(
        jnp.arange(num_classes)[None, :], (r, num_classes)
    ).reshape(-1)

    m = min(max_candidates, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, m)
    top_boxes = flat_boxes[top_idx]
    top_classes = flat_classes[top_idx]
    top_valid = top_scores > jnp.maximum(score_thresh, 0.0)

    if soft_nms_enabled:
        # reference fast_rcnn.py inference soft-NMS branch + layers/soft_nms.py:85
        from ..ops.soft_nms import batched_soft_nms

        keep_idx, new_scores, keep_valid = batched_soft_nms(
            top_boxes, top_scores, top_classes,
            method=soft_nms_method, gaussian_sigma=soft_nms_sigma,
            linear_threshold=nms_thresh, prune_threshold=soft_nms_prune,
            max_out=topk_per_image, valid=top_valid,
        )
        return DetectionResult(
            boxes=top_boxes[keep_idx],
            scores=jnp.where(keep_valid, new_scores, 0.0),
            classes=top_classes[keep_idx].astype(jnp.int32),
            valid=keep_valid,
        )
    keep_idx, keep_valid = batched_nms(
        top_boxes, top_scores, top_classes, nms_thresh, max_out=topk_per_image, valid=top_valid
    )
    return DetectionResult(
        boxes=top_boxes[keep_idx],
        scores=jnp.where(keep_valid, top_scores[keep_idx], 0.0),
        classes=top_classes[keep_idx].astype(jnp.int32),
        valid=keep_valid,
    )
