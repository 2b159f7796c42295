"""Keypoint heatmap-decode parity vs the reference torch oracle.

The reference (/root/reference/detectron2/structures/keypoints.py
heatmaps_to_keypoints:156-230) bicubically upsamples each ROI heatmap to
its (ceil(h), ceil(w)) pixel grid (a DYNAMIC shape), argmaxes, and maps
(x_int + 0.5) * (w / w_ceil) + x1. The TPU decode
(models/keypoint_head.py decode_keypoint_heatmaps) is static-shape: coarse
argmax + the same Keys a=-0.75 bicubic interpolant evaluated on a static
sub-bin lattice. Both discretize the SAME continuous interpolated surface,
so their argmax positions agree to within the two grid spacings — asserted
here at ~1px for realistic peaked heatmaps across box sizes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.models.keypoint_head import decode_keypoint_heatmaps  # noqa: E402

S = 56
K = 5


def oracle_decode(maps: np.ndarray, rois: np.ndarray) -> np.ndarray:
    """Reference heatmaps_to_keypoints (keypoints.py:156-230), verbatim
    semantics: per-ROI bicubic upsample to (ceil(h), ceil(w)), argmax."""
    mt = torch.from_numpy(maps).float()  # (N, K, S, S)
    rt = torch.from_numpy(rois).float()
    offset_x, offset_y = rt[:, 0], rt[:, 1]
    widths = (rt[:, 2] - rt[:, 0]).clamp(min=1)
    heights = (rt[:, 3] - rt[:, 1]).clamp(min=1)
    widths_ceil = widths.ceil()
    heights_ceil = heights.ceil()
    out = np.zeros((len(rois), maps.shape[1], 2), np.float64)
    for i in range(len(rois)):
        outsize = (int(heights_ceil[i]), int(widths_ceil[i]))
        roi_map = F.interpolate(mt[[i]], size=outsize, mode="bicubic", align_corners=False)[0]
        w = roi_map.shape[2]
        pos = roi_map.reshape(maps.shape[1], -1).argmax(1)
        x_int = pos % w
        y_int = torch.div(pos - x_int, w, rounding_mode="floor")
        x = (x_int.float() + 0.5) * (widths[i] / widths_ceil[i])
        y = (y_int.float() + 0.5) * (heights[i] / heights_ceil[i])
        out[i, :, 0] = (x + offset_x[i]).numpy()
        out[i, :, 1] = (y + offset_y[i]).numpy()
    return out


def _peaked_heatmaps(rng, n):
    """Gaussian peaks at random sub-bin positions + noise — the shape a
    trained keypoint head produces."""
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float64)
    maps = np.zeros((n, K, S, S), np.float32)
    peaks = np.zeros((n, K, 2))
    for i in range(n):
        for k in range(K):
            cy = rng.uniform(4, S - 4)
            cx = rng.uniform(4, S - 4)
            sigma = rng.uniform(1.5, 3.0)
            bump = 8.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
            maps[i, k] = bump + rng.randn(S, S) * 0.05
            peaks[i, k] = (cy, cx)
    return maps, peaks


def test_decode_matches_torch_oracle():
    rng = np.random.RandomState(5)
    n = 8
    maps, _ = _peaked_heatmaps(rng, n)
    # box sizes spanning small (sub-heatmap) to large (several px per bin)
    rois = np.zeros((n, 4), np.float64)
    sizes = [24, 40, 56, 80, 112, 150, 224, 300]
    for i, sz in enumerate(sizes):
        x1 = rng.uniform(0, 50)
        y1 = rng.uniform(0, 50)
        rois[i] = [x1, y1, x1 + sz, y1 + sz * rng.uniform(0.7, 1.3)]

    want = oracle_decode(maps, rois)  # (N, K, 2) xy

    heat = jnp.asarray(maps.transpose(0, 2, 3, 1))  # (N, S, S, K)
    got = np.asarray(
        decode_keypoint_heatmaps(heat, jnp.asarray(rois[None]))  # B=1, D=n
    )[0][..., :2]  # (N, K, 2) xy

    # tolerance: half an oracle output pixel + half a refined-lattice cell
    for i in range(n):
        w = rois[i, 2] - rois[i, 0]
        h = rois[i, 3] - rois[i, 1]
        tol_x = 0.5 * w / np.ceil(w) + 0.5 * (3.0 * w / S / 24) + 0.35
        tol_y = 0.5 * h / np.ceil(h) + 0.5 * (3.0 * h / S / 24) + 0.35
        np.testing.assert_allclose(got[i, :, 0], want[i, :, 0], atol=tol_x)
        np.testing.assert_allclose(got[i, :, 1], want[i, :, 1], atol=tol_y)


def test_refinement_beats_coarse_argmax():
    """The sub-bin refinement must localize the true continuous peak better
    than bin centers on a large box (where bins are several px wide)."""
    rng = np.random.RandomState(11)
    maps, peaks = _peaked_heatmaps(rng, 6)
    box = np.array([10.0, 20.0, 10.0 + 280.0, 20.0 + 280.0])
    rois = np.tile(box, (6, 1))

    heat = jnp.asarray(maps.transpose(0, 2, 3, 1))
    got = np.asarray(decode_keypoint_heatmaps(heat, jnp.asarray(rois[None])))[0]

    scale = 280.0 / S  # px per bin
    true_xy = np.stack(
        [10.0 + (peaks[..., 1] + 0.5) * scale, 20.0 + (peaks[..., 0] + 0.5) * scale], -1
    )
    refined_err = np.abs(got[..., :2] - true_xy).mean()
    # coarse decode = bin centers: quantization error ~ scale/4 on average
    assert refined_err < scale / 4, (refined_err, scale)


def test_decode_score_is_softmax_at_argmax():
    rng = np.random.RandomState(2)
    maps, _ = _peaked_heatmaps(rng, 2)
    rois = np.array([[0.0, 0.0, 56.0, 56.0], [10.0, 10.0, 66.0, 66.0]])
    heat = jnp.asarray(maps.transpose(0, 2, 3, 1))
    got = np.asarray(decode_keypoint_heatmaps(heat, jnp.asarray(rois[None])))[0]
    for i in range(2):
        for k in range(K):
            flat = maps[i, k].reshape(-1).astype(np.float64)
            p = np.exp(flat - flat.max())
            p /= p.sum()
            np.testing.assert_allclose(got[i, k, 2], p.max(), rtol=1e-5)
