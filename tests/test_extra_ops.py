"""Rotated-family + deformable-conv ops (the reference's CUDA parity set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.ops.deform_conv import deform_conv2d
from cddmsl_tpu.ops.rotated import (
    box_to_corners,
    nms_rotated,
    pairwise_iou_rotated,
    roi_align_rotated,
)


def test_rotated_iou_axis_aligned_matches_regular(rng):
    from cddmsl_tpu.structures.boxes import pairwise_iou

    n, m = 6, 5
    cxy = rng.rand(n, 2) * 50 + 20
    wh = rng.rand(n, 2) * 30 + 5
    r1 = np.concatenate([cxy, wh, np.zeros((n, 1))], 1).astype(np.float32)
    cxy2 = rng.rand(m, 2) * 50 + 20
    wh2 = rng.rand(m, 2) * 30 + 5
    r2 = np.concatenate([cxy2, wh2, np.zeros((m, 1))], 1).astype(np.float32)

    def to_xyxy(r):
        return np.concatenate([r[:, :2] - r[:, 2:4] / 2, r[:, :2] + r[:, 2:4] / 2], 1)

    got = np.asarray(pairwise_iou_rotated(jnp.asarray(r1), jnp.asarray(r2)))
    want = np.asarray(pairwise_iou(jnp.asarray(to_xyxy(r1)), jnp.asarray(to_xyxy(r2))))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotated_iou_45_analytic():
    # unit square vs its 45-degree rotation: IoU = sqrt(2)/2
    a = jnp.asarray([[0.0, 0, 2, 2, 0]])
    b = jnp.asarray([[0.0, 0, 2, 2, 45]])
    assert float(pairwise_iou_rotated(a, b)[0, 0]) == pytest.approx(0.70710678, abs=1e-4)


def test_nms_rotated_suppresses():
    boxes = jnp.asarray(
        [[50.0, 50, 20, 40, 10], [50, 50, 20, 40, 12], [150, 150, 20, 40, 0]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = nms_rotated(boxes, scores, 0.5, max_out=3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_roi_align_rotated_zero_angle_matches_axis_aligned(rng):
    from cddmsl_tpu.ops.roi_align import roi_align

    feat = jnp.asarray(rng.rand(20, 24, 4).astype(np.float32))
    # xyxy box (32, 48) - (160, 240) == xywha center (96,144) size (128,192), angle 0
    xyxy = jnp.asarray([[32.0, 48, 160, 240]])
    xywha = jnp.asarray([[96.0, 144, 128, 192, 0]])
    a = roi_align(feat, xyxy, (7, 7), 1 / 16, 2, True)
    b = roi_align_rotated(feat, xywha, (7, 7), 1 / 16, 2)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-4, atol=1e-5)


def test_deform_conv_zero_offsets_is_conv(rng):
    """With zero offsets and no mask, deformable conv == standard conv."""
    x = rng.rand(2, 10, 12, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1
    offsets = np.zeros((2, 10, 12, 18), np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w), stride=1, padding=1)

    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    want = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_deform_conv_shifting_offsets(rng):
    """An integer (dy,dx)=(0,1) offset on every tap shifts the sampled patch."""
    x = rng.rand(1, 8, 9, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32) * 0.1
    off = np.zeros((1, 8, 9, 18), np.float32)
    off[..., 1::2] = 1.0  # dx = +1 everywhere
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w), padding=1)

    from flax import linen as nn

    conv = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    x_shift = np.zeros_like(x)
    x_shift[:, :, :-1] = x[:, :, 1:]  # shift left == sampling at x+1
    want = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x_shift))
    # interior columns only (border handling differs at the seam)
    np.testing.assert_allclose(
        np.asarray(got)[:, 1:-1, 1:-2], np.asarray(want)[:, 1:-1, 1:-2], rtol=1e-3, atol=1e-3
    )


def test_deform_conv_modulation_scales_output(rng):
    x = rng.rand(1, 6, 6, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32) * 0.1
    off = np.zeros((1, 6, 6, 18), np.float32)
    mask_half = np.full((1, 6, 6, 9), 0.5, np.float32)
    full = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w), padding=1)
    half = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w), mask=jnp.asarray(mask_half), padding=1)
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full), rtol=1e-4, atol=1e-5)
