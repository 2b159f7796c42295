"""Mask-paste parity vs the reference's grid_sample oracle.

The reference pastes box-space mask probabilities into image space with
F.grid_sample(align_corners=False, padding_mode='zeros') and binarizes with
`>= threshold` (/root/reference/detectron2/layers/mask_ops.py _do_paste_mask
+ paste_masks_in_image:137). The semantics a clamp-based resampler gets
wrong, and which this test pins for all three implementations (jax /
numpy fallback / native C++):

  * values FADE to zero across the half-source-pixel band at the box edge
    (zero padding) instead of clamping to the edge value
  * no hard inside-the-box cutoff — the fade band extends half a source
    pixel past the box edge
  * `>=`, not `>`

Segm AP (COCO/LVIS/Cityscapes) and panoptic combination all consume these
pasted masks, so edge-pixel divergence is a direct AP risk.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.evaluation.masks import paste_masks_np  # noqa: E402
from cddmsl_tpu.models.mask_head import paste_masks_in_image  # noqa: E402

H, W = 80, 120
M = 28
THRESH = 0.5


def oracle_soft(masks: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """reference _do_paste_mask with skip_empty=False: soft pasted values."""
    mt = torch.from_numpy(masks)[:, None].float()
    bt = torch.from_numpy(boxes).float()
    n = len(masks)
    x0, y0, x1, y1 = bt[:, 0:1], bt[:, 1:2], bt[:, 2:3], bt[:, 3:4]
    img_y = torch.arange(H, dtype=torch.float32)[None, :] + 0.5
    img_x = torch.arange(W, dtype=torch.float32)[None, :] + 0.5
    gy = (img_y - y0) / (y1 - y0) * 2 - 1  # (N, H)
    gx = (img_x - x0) / (x1 - x0) * 2 - 1  # (N, W)
    grid = torch.stack(
        [gx[:, None, :].expand(n, H, W), gy[:, :, None].expand(n, H, W)], dim=3
    )
    with torch.no_grad():
        out = F.grid_sample(mt, grid, align_corners=False)
    return out[:, 0].numpy()


def _fixture():
    rng = np.random.RandomState(3)
    masks = rng.rand(10, M, M).astype(np.float32)
    # high-probability borders exercise the zero-pad fade band, where the
    # old clamp semantics kept the (super-threshold) edge value
    masks[:4, 0, :] = 0.95
    masks[:4, :, -1] = 0.95
    boxes = np.stack(
        [
            np.array([10.3, 8.7, 70.2, 60.1]),
            np.array([-15.0, -10.0, 40.0, 35.0]),  # extends past the top-left
            np.array([90.0, 50.0, 140.0, 95.0]),  # extends past the bottom-right
            np.array([30.0, 20.0, 33.5, 24.2]),  # tiny box
            np.array([0.0, 0.0, 120.0, 80.0]),  # full image
            np.array([55.5, 5.25, 119.75, 42.0]),
            np.array([2.0, 60.0, 50.0, 79.5]),
            np.array([40.0, 30.0, 90.0, 70.0]),
            np.array([-5.0, 40.0, 20.0, 85.0]),
            np.array([100.5, -8.0, 130.0, 30.0]),
        ]
    ).astype(np.float64)
    return masks, boxes


def _assert_binary_parity(got: np.ndarray, soft: np.ndarray):
    """Binary equality, tolerating flips only on knife-edge pixels where the
    soft value sits within float tolerance of the threshold."""
    want = soft >= THRESH
    knife = np.abs(soft - THRESH) < 1e-5
    mismatch = (got != want) & ~knife
    assert not mismatch.any(), (
        f"{mismatch.sum()} non-knife-edge pixels differ; "
        f"first at {np.argwhere(mismatch)[0]}"
    )


def test_jax_paste_matches_grid_sample_oracle():
    masks, boxes = _fixture()
    soft = oracle_soft(masks, boxes)
    got = np.asarray(
        paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (H, W), THRESH)
    )
    # the fade band must actually be exercised: some pixel outside every
    # box-interior test but inside the half-pixel band is positive
    assert (soft >= THRESH).sum() > 0
    _assert_binary_parity(got, soft)


def test_numpy_fallback_matches_oracle(monkeypatch):
    import cddmsl_tpu.csrc.build as csrc_build

    monkeypatch.setattr(csrc_build, "load_native", lambda name="": None)
    masks, boxes = _fixture()
    soft = oracle_soft(masks, boxes)
    got = paste_masks_np(masks, boxes, (H, W), THRESH)
    _assert_binary_parity(got, soft)


def test_native_cpp_matches_oracle():
    from cddmsl_tpu.csrc.build import load_native

    if load_native("maskops") is None:
        pytest.skip("no native toolchain")
    masks, boxes = _fixture()
    soft = oracle_soft(masks, boxes)
    got = paste_masks_np(masks, boxes, (H, W), THRESH)
    _assert_binary_parity(got, soft)


def test_fade_band_semantics():
    """The specific divergence the old implementation had: near the box edge
    the value must fade toward the zero padding, not clamp to the edge cell.

    Box [20.2, 48.2] with 28 cells -> 1px per cell. Pixel row 20 (center
    20.5) samples coord (20.5-20.2)-0.5 = -0.2: zero-pad bilinear weights
    the edge cell by 0.8, so a 0.55-hot mask gives 0.44 < threshold ->
    dropped. The old clamp implementation read the full 0.55 and kept it.
    """
    masks = np.full((1, M, M), 0.55, np.float32)
    boxes = np.array([[20.2, 20.2, 48.2, 48.2]], np.float64)
    soft = oracle_soft(masks, boxes)
    got = np.asarray(
        paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (H, W), THRESH)
    )
    _assert_binary_parity(got, soft)
    assert soft[0, 20, 25] == pytest.approx(0.8 * 0.55, abs=1e-5)
    assert not got[0, 20, 25]  # faded below threshold (old impl kept it)
    assert got[0, 22, 25]  # interior survives
