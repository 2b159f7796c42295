"""Keypoint R-CNN head + RoI assembly (TPU-native).

Re-implements the reference keypoint stack:
  * KRCNNConvDeconvUpsampleHead (detectron2/modeling/roi_heads/
    keypoint_head.py:272): convs + deconv + 2x bilinear upsample per-keypoint
    heatmaps
  * keypoints_to_heatmap targets (detectron2/structures/keypoints.py:97-152
    _keypoints_to_heatmap, Heckbert pixel-center convention, boundary coords
    clamp into the last bin)
  * heatmap -> keypoint decode (structures/keypoints.py:155-230
    heatmaps_to_keypoints). The reference bicubically upsamples each ROI
    heatmap to its (ceil(h), ceil(w)) pixel size — a dynamic shape per ROI.
    Here the decode argmaxes the STATIC heatmap, then refines with the same
    Keys a=-0.75 bicubic interpolant evaluated on a static sub-bin lattice
    (decode_keypoint_heatmaps): granularity 3*box/(56*24) ~ box/448 —
    subpixel for boxes under ~450px, vs the reference's fixed 1px. Torch-
    oracle parity: tests/test_keypoint_decode_parity.py.
  * CE loss over visible keypoints normalized by the visible count
    (keypoint_head.py keypoint_rcnn_loss with
    NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS=True semantics)
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

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
    normalizer: float = None,
) -> jnp.ndarray:
    """CE over flattened heatmap positions of visible keypoints (reference
    keypoint_head.py keypoint_rcnn_loss:40-96). `normalizer=None` divides by
    the visible count (the NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS=True path);
    a float divides by that amount instead (reference passes
    num_images * loss_normalizer)."""
    n, s, _, k = heatmaps.shape
    flat = heatmaps.reshape(n, s * s, k)
    lp = jax.nn.log_softmax(flat, axis=1)
    tgt = jnp.clip(kp_positions, 0, s * s - 1)
    nll = -jnp.take_along_axis(lp, tgt[:, None, :], axis=1)[:, 0, :]
    m = kp_visible.astype(jnp.float32)
    total = jnp.sum(nll * m)
    if normalizer is None:
        return total / jnp.maximum(jnp.sum(m), 1.0)
    return total / jnp.maximum(jnp.asarray(normalizer, jnp.float32), 1.0)


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
    loss_weight: float = 1.0  # ROI_KEYPOINT_HEAD.LOSS_WEIGHT
    # <=0: divide by visible-keypoint count (NORMALIZE_LOSS_BY_VISIBLE=True);
    # >0: divide by num_images * this (reference from_config passes
    # num_keypoints * batch_size_per_image * positive_fraction)
    loss_normalizer: float = -1.0

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
        norm = None if self.loss_normalizer <= 0 else b * self.loss_normalizer
        return {
            "loss_keypoint": self.loss_weight * keypoint_rcnn_loss(heat, pos, vis, norm)
        }

    def inference(self, features, boxes):
        """boxes (B,D,4) -> (B, D, K, 3) decoded (x, y, score)."""
        b, d = boxes.shape[:2]
        heat = self.keypoint_head(self._pool(features, boxes))  # (B*D, S2, S2, K)
        return decode_keypoint_heatmaps(heat, boxes)


def _refine_matrix(size: int, grid: int, span: float = 1.5):
    """(grid, 2*ceil(span)+4) matrix A evaluating the 1-D bicubic interpolant
    at `grid` static offsets in (-span, span) bins around the argmax bin:
    interp(argmax + off[g]) = sum_t A[g, t] * heat[argmax - R + t], with
    R = ceil(span) + 1 taps of left padding. Pure constants — folded by XLA."""
    import numpy as _np

    def cubic(d, a=-0.75):
        # Keys cubic-convolution kernel, a=-0.75 (torch
        # F.interpolate(mode='bicubic')'s kernel); numpy so the matrix is a
        # compile-time constant (jnp here would leak tracers under jit)
        d = _np.abs(d)
        return _np.where(
            d <= 1.0,
            ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0,
            ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a,
        )

    offs = (_np.arange(grid) + 0.5) / grid * (2 * span) - span  # (-span, span)
    r = int(_np.ceil(span)) + 1
    width = 2 * r + 2
    A = _np.zeros((grid, width), _np.float64)
    for g, off in enumerate(offs):
        base = int(_np.floor(off))
        frac = off - base
        for t, tap in enumerate(range(-1, 3)):
            A[g, base + tap + r] += cubic(frac - tap)
    return A.astype(_np.float32), offs.astype(_np.float32), r


def decode_keypoint_heatmaps(
    heat: jnp.ndarray, boxes: jnp.ndarray, refine_grid: int = 24
) -> jnp.ndarray:
    """(B*D, S2, S2, K) heatmaps + (B, D, 4) boxes -> (B, D, K, 3) decoded
    (x, y, score).

    Matches reference structures/keypoints.py heatmaps_to_keypoints (bicubic
    upsample to the box's pixel grid, global argmax, Heckbert +0.5 mapping)
    with static shapes: coarse argmax on the raw map, then a bicubic
    sub-bin refinement — the Keys a=-0.75 interpolant (torch's bicubic) is
    evaluated on a static refine_grid x refine_grid lattice spanning
    argmax +- 1.5 bins and re-argmaxed. Localization granularity is
    3*box/(S*refine_grid) (~box/448 at S=56, grid=24) vs the reference's
    1px; the continuous mapping x = (s + 0.5) * w / S + x1 is the exact
    limit of the reference's (x_int + 0.5) * (w / w_ceil) + x1.
    Parity: tests/test_keypoint_decode_parity.py."""
    b, d = boxes.shape[:2]
    n, size, _, k = heat.shape
    flat = heat.reshape(n, size * size, k)
    idx = jnp.argmax(flat, axis=1)  # (N, K)
    score = jax.nn.softmax(flat, axis=1)
    score = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0, :]
    ky, kx = idx // size, idx % size  # (N, K) coarse bins

    A, offs, r = _refine_matrix(size, refine_grid)
    A = jnp.asarray(A)  # (G, T)
    taps = jnp.arange(A.shape[1]) - r  # (T,) static offsets around the bin

    hkc = jnp.moveaxis(heat, -1, 1)  # (N, K, S, S)

    def one(hm, by, bx):  # hm (S, S); scalars
        ry = jnp.clip(by + taps, 0, size - 1)
        rx = jnp.clip(bx + taps, 0, size - 1)
        patch = hm[ry][:, rx]  # (T, T) edge-clamped (torch replicates edges)
        vals = A @ patch @ A.T  # (G, G) interpolated surface
        g = jnp.argmax(vals)
        gy, gx = g // refine_grid, g % refine_grid
        return by + jnp.asarray(offs)[gy], bx + jnp.asarray(offs)[gx]

    sy, sx = jax.vmap(jax.vmap(one))(hkc, ky, kx)  # (N, K) refined coords
    bx_ = boxes.reshape(n, 4)
    x1, y1 = bx_[:, 0:1], bx_[:, 1:2]
    w = jnp.maximum(bx_[:, 2:3] - x1, 1e-4)
    h = jnp.maximum(bx_[:, 3:4] - y1, 1e-4)
    px = x1 + (sx + 0.5) * w / size
    py = y1 + (sy + 0.5) * h / size
    return jnp.stack([px, py, score], axis=-1).reshape(b, d, k, 3)
