"""Box2BoxTransform: (dx, dy, dw, dh) delta encode/apply.

Same math as the reference (detectron2/modeling/box_regression.py:270
`Box2BoxTransform.get_deltas` / `apply_deltas`), as pure jnp functions plus a
thin class carrying the weights.
"""

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


class Box2BoxTransform:
    def __init__(self, weights: Sequence[float], scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """(..., 4),(..., 4) XYXY -> (..., 4) deltas. Zero-size sources are
        guarded with a 1-pixel floor so padded rows don't produce inf/NaN (the
        reference asserts finiteness instead; padding rows are masked out of
        every loss downstream)."""
        src_w = jnp.maximum(src_boxes[..., 2] - src_boxes[..., 0], 1e-4)
        src_h = jnp.maximum(src_boxes[..., 3] - src_boxes[..., 1], 1e-4)
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-4)
        tgt_h = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-4)
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        dx = wx * (tgt_cx - src_cx) / src_w
        dy = wy * (tgt_cy - src_cy) / src_h
        dw = ww * jnp.log(tgt_w / src_w)
        dh = wh * jnp.log(tgt_h / src_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., K*4), boxes (..., 4) -> (..., K*4) transformed XYXY."""
        boxes = boxes.astype(deltas.dtype)
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * w
        cy = boxes[..., 1] + 0.5 * h

        wx, wy, ww, wh = self.weights
        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 4))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.clip(d[..., 2] / ww, None, self.scale_clamp)
        dh = jnp.clip(d[..., 3] / wh, None, self.scale_clamp)

        pred_cx = dx * w[..., None] + cx[..., None]
        pred_cy = dy * h[..., None] + cy[..., None]
        pred_w = jnp.exp(dw) * w[..., None]
        pred_h = jnp.exp(dh) * h[..., None]

        out = jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(shape)


class Box2BoxTransformRotated:
    """5-param rotated-box deltas (reference modeling/box_regression.py
    Box2BoxTransformRotated): boxes are (cx, cy, w, h, angle_degrees); the
    angle delta is in radians-scaled degrees (da = wa * diff * pi / 180) and
    predicted angles are normalized to (-180, 180]."""

    def __init__(self, weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0, 1.0),
                 scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        wx, wy, ww, wh, wa = self.weights
        sw = jnp.maximum(src[..., 2], 1e-4)
        sh = jnp.maximum(src[..., 3], 1e-4)
        dx = wx * (target[..., 0] - src[..., 0]) / sw
        dy = wy * (target[..., 1] - src[..., 1]) / sh
        dw = ww * jnp.log(jnp.maximum(target[..., 2], 1e-4) / sw)
        dh = wh * jnp.log(jnp.maximum(target[..., 3], 1e-4) / sh)
        da = target[..., 4] - src[..., 4]
        da = (da + 180.0) % 360.0 - 180.0  # normalize to [-180, 180)
        da = da * (wa * math.pi / 180.0)
        return jnp.stack([dx, dy, dw, dh, da], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., K*5), boxes (..., 5) -> (..., K*5)."""
        wx, wy, ww, wh, wa = self.weights
        boxes = boxes.astype(deltas.dtype)
        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 5))
        cx = boxes[..., 0][..., None]
        cy = boxes[..., 1][..., None]
        w = boxes[..., 2][..., None]
        h = boxes[..., 3][..., None]
        a = boxes[..., 4][..., None]
        pred_cx = d[..., 0] / wx * w + cx
        pred_cy = d[..., 1] / wy * h + cy
        pred_w = jnp.exp(jnp.clip(d[..., 2] / ww, None, self.scale_clamp)) * w
        pred_h = jnp.exp(jnp.clip(d[..., 3] / wh, None, self.scale_clamp)) * h
        pred_a = a + d[..., 4] * (180.0 / math.pi) / wa
        pred_a = (pred_a + 180.0) % 360.0 - 180.0
        return jnp.stack([pred_cx, pred_cy, pred_w, pred_h, pred_a], axis=-1).reshape(shape)
