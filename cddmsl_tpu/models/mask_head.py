"""Mask R-CNN mask head (reference detectron2/modeling/roi_heads/
mask_head.py:292 MaskRCNNConvUpsampleHead + mask_rcnn_loss/inference):
4 convs + deconv + 1x1 predictor over pooled FG regions, per-class BCE
against boxes-cropped GT masks, sigmoid inference. Supports
cfg.MODEL.MASK_ON parity (CDDMSL itself runs MASK_ON=False)."""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskRCNNConvUpsampleHead(nn.Module):
    """NUM_CONV 3x3 convs (0 for C4, 4 for FPN) + 2x deconv + 1x1 predictor
    (reference mask_head.py:MaskRCNNConvUpsampleHead + defaults.py
    ROI_MASK_HEAD.NUM_CONV/CONV_DIM)."""

    num_classes: int
    num_conv: int = 0
    conv_dim: int = 256
    cls_agnostic: bool = False
    conv_norm: str = ""  # ROI_MASK_HEAD.NORM ("", "GN" or "SyncBN")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, P, P, C) pooled features -> (N, 2P, 2P, K or 1) logits."""
        from .backbone.batch_norm import GroupNorm32, SyncBatchNorm

        x = x.astype(self.dtype)
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=(self.conv_norm == ""),
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"mask_fcn{i+1}")(x)
            if self.conv_norm == "GN":
                x = GroupNorm32(self.conv_dim, dtype=self.dtype, name=f"mask_fcn{i+1}_gn")(x)
            elif self.conv_norm == "SyncBN":
                x = SyncBatchNorm(self.conv_dim, axis_name=None, dtype=self.dtype,
                                  name=f"mask_fcn{i+1}_bn")(x)
            x = nn.relu(x)
        x = nn.relu(
            nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="deconv")(x)
        )
        out_ch = 1 if self.cls_agnostic else self.num_classes
        return nn.Conv(out_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="predictor")(
            x
        ).astype(jnp.float32)


def mask_rcnn_loss(
    mask_logits: jnp.ndarray,  # (N, M, M, K)
    gt_masks_cropped: jnp.ndarray,  # (N, M, M) {0,1} GT rasterized in box coords
    gt_classes: jnp.ndarray,  # (N,)
    fg_valid: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Per-class BCE over FG regions (reference mask_head.py mask_rcnn_loss)."""
    n = mask_logits.shape[0]
    cls = jnp.clip(gt_classes, 0, mask_logits.shape[-1] - 1)
    logit = jnp.take_along_axis(mask_logits, cls[:, None, None, None], axis=-1)[..., 0]
    t = gt_masks_cropped.astype(jnp.float32)
    bce = jnp.maximum(logit, 0) - logit * t + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    per = jnp.mean(bce, axis=(1, 2))
    w = fg_valid.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def mask_rcnn_inference(mask_logits: jnp.ndarray, pred_classes: jnp.ndarray) -> jnp.ndarray:
    """Select the predicted class channel, sigmoid (reference
    mask_head.py mask_rcnn_inference). (N, M, M, K), (N,) -> (N, M, M)."""
    cls = jnp.clip(pred_classes, 0, mask_logits.shape[-1] - 1)
    sel = jnp.take_along_axis(mask_logits, cls[:, None, None, None], axis=-1)[..., 0]
    return jax.nn.sigmoid(sel)


def crop_mask_targets(
    canvas: jnp.ndarray,  # (G, Hm, Wm) {0,1} GT bitmask canvas at `stride`
    gt_idx: jnp.ndarray,  # (S,) matched GT index per sampled proposal
    boxes: jnp.ndarray,  # (S, 4) XYXY in image coords
    out_size: int,
    stride: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """GT targets for the mask loss: crop each proposal's matched GT bitmask
    to the box and resize to (out_size, out_size), then threshold at 0.5.

    Replicates BitMasks.crop_and_resize (reference structures/masks.py:
    ROIAlign(output_size, 1.0, 0, aligned=True) then >= 0.5) with a fixed
    sampling_ratio (static shapes; the repo uses 2 elsewhere too). The crop
    is a tiny per-ROI gather — out_size^2 * sr^2 points — so no (S, Hm, Wm)
    intermediate materializes.
    """
    g, hm, wm = canvas.shape
    sr = max(sampling_ratio, 1)

    def one(idx, box):
        m = canvas[idx]  # (Hm, Wm)
        x1, y1, x2, y2 = box / stride
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        # aligned=True ROIAlign sample grid: bin centers offset by -0.5
        ys = y1 + (jnp.arange(out_size * sr) + 0.5) * bh / (out_size * sr) - 0.5
        xs = x1 + (jnp.arange(out_size * sr) + 0.5) * bw / (out_size * sr) - 0.5
        yy = jnp.clip(ys, 0.0, hm - 1.0)
        xx = jnp.clip(xs, 0.0, wm - 1.0)
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, hm - 1)
        x1i = jnp.minimum(x0 + 1, wm - 1)
        ly = (yy - y0)[:, None]
        lx = (xx - x0)[None, :]
        v = (
            m[y0][:, x0] * (1 - ly) * (1 - lx)
            + m[y0][:, x1i] * (1 - ly) * lx
            + m[y1i][:, x0] * ly * (1 - lx)
            + m[y1i][:, x1i] * ly * lx
        )  # (out*sr, out*sr)
        v = v.reshape(out_size, sr, out_size, sr).mean(axis=(1, 3))
        return (v >= 0.5).astype(jnp.float32)

    return jax.vmap(one)(gt_idx, boxes)


def paste_masks_in_image(
    masks: jnp.ndarray,  # (N, M, M) probabilities
    boxes: jnp.ndarray,  # (N, 4)
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Paste box-space masks into image space (reference layers/mask_ops.py
    _do_paste_mask) via inverse bilinear sampling — static shapes.

    Exact grid_sample(align_corners=False, padding_mode='zeros') semantics:
    sample coordinates are NOT clamped — out-of-range taps contribute zero,
    so values fade to 0 across the half-source-pixel band at the box edge
    instead of clamping to the edge value; binarization is `>= threshold`
    (mask_ops.py:137). Verified against the torch oracle in
    tests/test_mask_paste_parity.py."""
    H, W = image_hw
    n, m, _ = masks.shape

    def one(mask, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(x2 - x1, 1e-3)
        h = jnp.maximum(y2 - y1, 1e-3)
        ys = (jnp.arange(H) + 0.5 - y1) / h * m - 0.5
        xs = (jnp.arange(W) + 0.5 - x1) / w * m - 0.5
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        ly = ys - y0
        lx = xs - x0

        def taps(i0, frac):
            # (index, weight) pairs with zero weight outside [0, m-1]
            w0 = (1 - frac) * ((i0 >= 0) & (i0 <= m - 1))
            w1 = frac * ((i0 + 1 >= 0) & (i0 + 1 <= m - 1))
            return (jnp.clip(i0, 0, m - 1), w0), (jnp.clip(i0 + 1, 0, m - 1), w1)

        (r0, wy0), (r1, wy1) = taps(y0, ly)
        (c0, wx0), (c1, wx1) = taps(x0, lx)
        v = (
            mask[r0][:, c0] * wy0[:, None] * wx0[None, :]
            + mask[r0][:, c1] * wy0[:, None] * wx1[None, :]
            + mask[r1][:, c0] * wy1[:, None] * wx0[None, :]
            + mask[r1][:, c1] * wy1[:, None] * wx1[None, :]
        )
        return v >= threshold

    return jax.vmap(one)(masks, boxes)
