"""Extended transform family (reference transforms/transform.py
RotationTransform/ExtentTransform/BlendTransform + the color augmentations)."""

import numpy as np
import pytest

from cddmsl_tpu.data.transforms import (
    BlendTransform,
    ExtentTransform,
    RandomBrightness,
    RandomContrast,
    RandomLighting,
    RandomRotation,
    RandomSaturation,
    RotationTransform,
)


def test_rotation_90_exact():
    h, w = 40, 60
    t = RotationTransform(h, w, 90, expand=True)
    assert (t.new_h, t.new_w) == (60, 40)
    img = np.zeros((h, w, 3), np.uint8)
    img[5, 10] = 255
    out = t.apply_image(img)
    assert out.shape[:2] == (60, 40)
    # coordinate mapping: PIL rotates CCW; point (x, y) -> (y, new_h - x)
    pt = t.apply_coords(np.asarray([[10.0, 5.0]]))
    # the bright pixel must be at/near the mapped coordinate
    yy, xx = np.argwhere(out[:, :, 0] > 128)[0]
    np.testing.assert_allclose(pt[0], [xx + 0.5, yy + 0.5], atol=1.5)


def test_rotation_box_is_hull():
    t = RotationTransform(100, 100, 45, expand=True)
    box = np.asarray([[40.0, 40, 60, 60]])
    out = t.apply_box(box)[0]
    # a rotated square's AABB is larger
    assert (out[2] - out[0]) > 20 and (out[3] - out[1]) > 20
    # round-trip of the center
    c = t.apply_coords(np.asarray([[50.0, 50]]))[0]
    np.testing.assert_allclose([(out[0] + out[2]) / 2, (out[1] + out[3]) / 2], c, atol=1e-4)


def test_extent_transform():
    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    t = ExtentTransform((10, 5, 50, 35), (30, 40))  # src x0,y0,x1,y1 -> (h=30, w=40)
    out = t.apply_image(img)
    assert out.shape[:2] == (30, 40)
    pts = t.apply_coords(np.asarray([[10.0, 5.0], [50.0, 35.0]]))
    np.testing.assert_allclose(pts, [[0, 0], [40, 30]], atol=1e-5)


def test_color_augmentations_geometry_identity():
    rng = np.random.RandomState(0)
    img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    boxes = np.asarray([[2.0, 3, 10, 12]])
    for aug in (
        RandomBrightness(0.5, 1.5),
        RandomContrast(0.5, 1.5),
        RandomSaturation(0.5, 1.5),
        RandomLighting(0.5),
    ):
        t = aug.get_transform(img, rng)
        out = t.apply_image(img)
        assert out.shape == img.shape and out.dtype == img.dtype
        np.testing.assert_array_equal(t.apply_box(boxes), boxes)


def test_brightness_scales():
    img = np.full((4, 4, 3), 100, np.uint8)
    t = BlendTransform(0.0, src_weight=0.0, dst_weight=0.5)
    np.testing.assert_array_equal(t.apply_image(img), np.full((4, 4, 3), 50, np.uint8))


def test_random_rotation_sampling():
    rng = np.random.RandomState(0)
    img = np.zeros((10, 10, 3), np.uint8)
    t = RandomRotation((0.0, 0.0)).get_transform(img, rng)
    from cddmsl_tpu.data.transforms import NoOpTransform

    assert isinstance(t, NoOpTransform)
    t2 = RandomRotation([30.0], sample_style="choice").get_transform(img, rng)
    assert isinstance(t2, RotationTransform)


def test_rotation_canvas_matches_pil_property():
    """new_h/new_w must equal PIL's expand=True output for arbitrary angles
    (code-review finding: the old ceil-of-extent formula was off by 1px for
    most (angle, h, w) combinations, shifting all coordinates)."""
    r = np.random.RandomState(0)
    for _ in range(60):
        h, w = int(r.randint(30, 200)), int(r.randint(30, 200))
        a = float(r.uniform(-180, 180))
        t = RotationTransform(h, w, a, expand=True)
        out = t.apply_image((r.rand(h, w, 3) * 255).astype(np.uint8))
        assert out.shape[:2] == (t.new_h, t.new_w), (h, w, a)
