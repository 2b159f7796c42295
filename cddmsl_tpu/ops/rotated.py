"""Rotated-box operations (XLA-native, static shapes).

Replaces the reference CUDA kernels for the rotated detection family
(detectron2/layers/csrc/box_iou_rotated/*, nms_rotated/*,
ROIAlignRotated/*; structures/rotated_boxes.py:505):
  * `pairwise_iou_rotated`: exact intersection via Sutherland-Hodgman polygon
    clipping with a fixed 16-vertex capacity (two rectangles intersect in at
    most 8 vertices) — fully vectorized, no data-dependent shapes
  * `nms_rotated`: the tiled-fixpoint greedy NMS of ops/nms.py with the
    rotated IoU plugged in
  * `roi_align_rotated`: bilinear sampling on the rotated grid

Boxes are (cx, cy, w, h, angle_degrees CCW) like the reference XYWHA_ABS.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_CAP = 16  # vertex capacity through clipping


def box_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) -> (..., 4, 2) corner points (CCW)."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    theta = a * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = jnp.stack([-w, w, w, -w], -1) * 0.5  # (..., 4)
    dy = jnp.stack([-h, -h, h, h], -1) * 0.5
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([x, y], axis=-1)


def _clip_against_edge(pts, valid, p1, p2):
    """Clip a padded polygon against the half-plane left of edge p1->p2.
    pts: (CAP, 2); valid: (CAP,) bool. Returns same-capacity result."""
    # signed distance: >0 means inside (left of edge, CCW clipper)
    edge = p2 - p1
    d = edge[0] * (pts[:, 1] - p1[1]) - edge[1] * (pts[:, 0] - p1[0])
    nxt = jnp.roll(jnp.arange(_CAP), -1)
    # treat the ring as only over valid verts: successor of last valid is first valid
    count = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.arange(_CAP)
    succ = jnp.where(idx + 1 < count, idx + 1, 0)
    p_cur = pts
    p_nxt = pts[succ]
    d_cur = d
    d_nxt = d[succ]

    inside_cur = d_cur >= 0
    inside_nxt = d_nxt >= 0
    # intersection point of segment with edge line
    t = d_cur / jnp.where(jnp.abs(d_cur - d_nxt) > 1e-12, d_cur - d_nxt, 1e-12)
    inter = p_cur + t[:, None] * (p_nxt - p_cur)

    seg_valid = idx < count
    # each input segment emits up to 2 points: cur (if inside) and the
    # intersection (if the segment crosses)
    emit1 = seg_valid & inside_cur
    emit2 = seg_valid & (inside_cur != inside_nxt)
    out_pts = jnp.zeros((_CAP, 2))
    out_valid = jnp.zeros((_CAP,), bool)
    # pack: positions via cumulative counts
    n1 = emit1.astype(jnp.int32)
    n2 = emit2.astype(jnp.int32)
    offsets = jnp.cumsum(n1 + n2) - (n1 + n2)
    pos1 = offsets
    pos2 = offsets + n1
    out_pts = out_pts.at[jnp.where(emit1, pos1, _CAP - 1)].set(
        jnp.where(emit1[:, None], p_cur, 0.0), mode="drop"
    )
    # careful: use separate scatter for intersections
    out_pts2 = jnp.zeros((_CAP, 2))
    out_pts2 = out_pts2.at[jnp.where(emit2, pos2, _CAP - 1)].set(
        jnp.where(emit2[:, None], inter, 0.0), mode="drop"
    )
    out_pts = out_pts + out_pts2
    total = jnp.sum(n1 + n2)
    out_valid = jnp.arange(_CAP) < total
    return out_pts, out_valid


def _intersection_area(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Area of intersection of two convex quads ((4,2) each)."""
    pts = jnp.zeros((_CAP, 2)).at[:4].set(corners1)
    valid = jnp.arange(_CAP) < 4
    for i in range(4):
        p1 = corners2[i]
        p2 = corners2[(i + 1) % 4]
        pts, valid = _clip_against_edge(pts, valid, p1, p2)
    # shoelace over the valid ring
    count = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.arange(_CAP)
    succ = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = pts[:, 0], pts[:, 1]
    cross = x * y[succ] - x[succ] * y
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(idx < count, cross, 0.0)))
    return jnp.where(count >= 3, area, 0.0)


def pairwise_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N,5),(M,5) XYWHA -> (N,M) IoU."""
    c1 = box_to_corners(boxes1)  # (N,4,2)
    c2 = box_to_corners(boxes2)  # (M,4,2)
    inter = jax.vmap(lambda a: jax.vmap(lambda b: _intersection_area(a, b))(c2))(c1)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def nms_rotated(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over rotated boxes (reference layers/nms.py:12-14
    nms_rotated). Simple full-matrix fixpoint (rotated sets are small)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked = jnp.where(valid, scores, neg_inf)
    _, order = jax.lax.top_k(masked, n)
    bs, vs = boxes[order], valid[order]
    iou = pairwise_iou_rotated(bs, bs)
    rows = jnp.arange(n)
    sup_mask = (iou > iou_threshold) & (rows[None, :] > rows[:, None])

    def cond(state):
        cur, prev, it = state
        return jnp.logical_and(it < n, jnp.any(cur != prev))

    def body(state):
        cur, _, it = state
        sup = jnp.any(sup_mask & cur[:, None], axis=0)
        return vs & ~sup, cur, it + 1

    kept_sorted, _, _ = jax.lax.while_loop(cond, body, (vs, ~vs, 0))
    keep = jnp.zeros((n,), bool).at[order].set(kept_sorted)
    kept_scores = jnp.where(keep, scores, neg_inf)
    top_scores, idx = jax.lax.top_k(kept_scores, min(max_out, n))
    out_valid = top_scores > neg_inf
    return jnp.where(out_valid, idx, 0).astype(jnp.int32), out_valid


def roi_align_rotated(
    features: jnp.ndarray,  # (H, W, C)
    boxes: jnp.ndarray,  # (R, 5) XYWHA in image coords
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Bilinear sampling on the rotated grid (reference
    csrc/ROIAlignRotated; aligned semantics with the -0.5 offset)."""
    H, W, C = features.shape
    PH, PW = output_size
    S = max(sampling_ratio, 1)

    def one(box):
        cx, cy, w, h, a = box * jnp.asarray([spatial_scale, spatial_scale, spatial_scale, spatial_scale, 1.0])
        theta = a * (jnp.pi / 180.0)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        bin_h, bin_w = h / PH, w / PW
        sy = (jnp.arange(S) + 0.5) / S
        ys = (jnp.arange(PH)[:, None] + sy[None, :]) * bin_h - h / 2  # (PH,S)
        xs = (jnp.arange(PW)[:, None] + sy[None, :]) * bin_w - w / 2
        yy = jnp.broadcast_to(ys[:, None, :, None], (PH, PW, S, S))
        xx = jnp.broadcast_to(xs[None, :, None, :], (PH, PW, S, S))
        gx = cx + xx * cos - yy * sin - 0.5
        gy = cy + xx * sin + yy * cos - 0.5
        ok = (gy > -1.0) & (gy < H) & (gx > -1.0) & (gx < W)
        y = jnp.clip(gy, 0.0, H - 1)
        x = jnp.clip(gx, 0.0, W - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        ly, lx = (y - y0)[..., None], (x - x0)[..., None]
        v = (
            features[y0, x0] * (1 - ly) * (1 - lx)
            + features[y0, x1] * (1 - ly) * lx
            + features[y1, x0] * ly * (1 - lx)
            + features[y1, x1] * ly * lx
        ) * ok[..., None]
        return jnp.mean(v, axis=(2, 3))

    return jax.vmap(one)(boxes)
