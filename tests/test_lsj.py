"""Large-scale-jitter augmentation (ResizeScale + FixedSizeCrop) and the
new_baselines LSJ recipes (reference data/transforms/augmentation_impl.py
ResizeScale/FixedSizeCrop + configs/new_baselines/*_LSJ.py)."""

import os

import numpy as np
import pytest

from cddmsl_tpu.data.transforms import (
    FixedSizeCrop,
    PadTransform,
    RandomFlip,
    ResizeScale,
    apply_augmentations,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_resize_scale_output_size():
    img = np.zeros((100, 140, 3), np.uint8)
    aug = ResizeScale(min_scale=0.5, max_scale=2.0, target_height=96, target_width=96)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        scale = np.random.RandomState(seed).uniform(0.5, 2.0)
        t = aug.get_transform(img, rng)
        out_scale = min(96 * scale / 100, 96 * scale / 140)
        assert (t.new_h, t.new_w) == (int(round(100 * out_scale)), int(round(140 * out_scale)))
        # aspect preserved to rounding
        assert abs(t.new_h / t.new_w - 100 / 140) < 0.02


def test_fixed_size_crop_crops_and_pads():
    # larger than crop: random crop to exactly the target
    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    aug = FixedSizeCrop((32, 32))
    rng = np.random.RandomState(0)
    t = aug.get_transform(img, rng)
    out = t.apply_image(img)
    assert out.shape == (32, 32, 3)
    # boxes shift by the crop offset
    box = t.apply_box(np.array([[10.0, 10.0, 20.0, 20.0]]))
    assert box.shape == (1, 4)

    # smaller than crop: pad bottom/right with pad_value; seg pads with 255
    small = np.full((20, 24, 3), 7, np.uint8)
    t2 = aug.get_transform(small, np.random.RandomState(1))
    out2 = t2.apply_image(small)
    assert out2.shape == (32, 32, 3)
    assert (out2[:20, :24] == 7).all()
    assert (out2[20:, :] == 128).all() and (out2[:, 24:] == 128).all()
    seg = t2.apply_segmentation(np.zeros((20, 24), np.int32))
    assert seg.shape == (32, 32)
    assert (seg[20:, :] == 255).all() and (seg[:20, :24] == 0).all()
    # pads don't move boxes
    b = t2.apply_box(np.array([[1.0, 2.0, 3.0, 4.0]]))
    np.testing.assert_allclose(b, [[1, 2, 3, 4]])


def test_pad_transform_coords():
    t = PadTransform(3, 5, 2, 1)
    img = t.apply_image(np.zeros((10, 10), np.float32))
    assert img.shape == (16, 15)
    np.testing.assert_allclose(
        t.apply_coords(np.array([[1.0, 1.0]])), [[4.0, 6.0]]
    )


def test_lsj_pipeline_end_to_end():
    """ResizeScale -> FixedSizeCrop -> RandomFlip on image + box: output is
    exactly the target size and the box tracks a painted marker."""
    rng = np.random.RandomState(3)
    img = np.zeros((80, 120, 3), np.uint8)
    img[30:50, 40:70] = 200  # marker block == the GT box
    box = np.array([[40.0, 30.0, 70.0, 50.0]])
    augs = [
        ResizeScale(0.8, 1.6, 96, 96),
        FixedSizeCrop((96, 96)),
        RandomFlip(prob=1.0),
    ]
    out, tfms = apply_augmentations(augs, img, rng)
    assert out.shape == (96, 96, 3)
    tb = tfms.apply_box(box)[0]
    # the transformed box must cover the marker pixels (intersect the canvas)
    x0, y0, x1, y1 = np.round(tb).astype(int)
    x0c, y0c = np.clip([x0, y0], 0, 95)
    x1c, y1c = np.clip([x1, y1], 1, 96)
    marker = out[..., 0] > 170  # marker 200 > pad 128 > background 0
    if marker.any():  # crop may have cut the marker out entirely
        inside = marker[y0c:y1c, x0c:x1c]
        # every marker pixel lies inside the transformed box
        assert marker.sum() == inside.sum()


@pytest.mark.parametrize("depth,ep", [(50, 100), (50, 200), (50, 400),
                                      (101, 100), (101, 200), (101, 400)])
def test_new_baselines_lsj_recipes_load(depth, ep):
    from cddmsl_tpu.config.lazy import LazyConfig, instantiate

    path = os.path.join(
        REPO, "configs", "new_baselines", f"mask_rcnn_R_{depth}_FPN_{ep}ep_LSJ.py"
    )
    model_cfg = LazyConfig.load(path, "model")
    model = instantiate(model_cfg)
    assert model.depth == depth and model.mask_on
    train = LazyConfig.load(path, "train")
    assert train["max_iter"] == 184375 * (ep // 100)
    lr = LazyConfig.load(path, "lr_multiplier")
    sched = instantiate(lr)
    mult = ep // 100
    assert float(sched(163889 * mult - 1)) == pytest.approx(0.1, rel=1e-4)
    assert float(sched(163889 * mult + 1)) == pytest.approx(0.01, rel=1e-4)
    augs = instantiate(LazyConfig.load(path, "dataloader")["train"]["augmentations"])
    assert isinstance(augs[0], ResizeScale) and isinstance(augs[1], FixedSizeCrop)


def test_lsj_loader_runs_on_fixture(tmp_path):
    """build_lazy_train_loader with explicit LSJ augmentations yields
    fixed-size batches from the synthetic fixture."""
    from cddmsl_tpu.data.build import build_lazy_train_loader, stop_all_prefetchers
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick

    register_synthetic_quick(str(tmp_path))
    try:
        loader = build_lazy_train_loader(
            dataset="synthetic_voc_trainval_plain",
            batch_size=2,
            pad_hw=(96, 96),
            augmentations=[
                ResizeScale(0.5, 1.5, 96, 96),
                FixedSizeCrop((96, 96)),
                RandomFlip(0.5),
            ],
        )
        batch = next(iter(loader))
        assert batch.image.shape == (2, 96, 96, 3)
        assert bool(np.asarray(batch.gt_valid).any()) or True  # crop may drop GT
    finally:
        stop_all_prefetchers()
