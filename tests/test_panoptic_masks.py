"""PanopticFPN instance-mask path (reference Base-Panoptic-FPN.yaml
MASK_ON: True — PanopticFPN IS Mask R-CNN + semseg, and
combine_semantic_and_instance_outputs paints MASKS, panoptic_fpn.py:46-80):
the panoptic mapper cuts per-thing bitmasks from the id map, collation
rasterizes them into the strided canvases, the model trains/infers the mask
branch, and the combine uses the pasted mask instead of the box rectangle."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from cddmsl_tpu.models.rcnn import DetBatch


def _write_panoptic_sample(root, h=64, w=96):
    """One image whose thing (id 1) is an L-shaped region inside bbox."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    img_path = os.path.join(root, "im.jpg")
    Image.fromarray(img).save(img_path)
    ids = np.full((h, w), 2, np.int32)
    # L-shape: vertical bar + horizontal foot inside bbox [8,8,40,48]
    ids[8:48, 8:20] = 1
    ids[36:48, 8:40] = 1
    png = np.stack([ids % 256, ids // 256, ids // 65536], axis=-1).astype(np.uint8)
    pan_path = os.path.join(root, "im_pan.png")
    Image.fromarray(png).save(pan_path)
    return {
        "file_name": img_path,
        "pan_seg_file_name": pan_path,
        "image_id": 0,
        "segments_info": [
            {"id": 1, "category_id": 1, "isthing": True, "iscrowd": 0,
             "bbox": [8, 8, 32, 40], "area": 40 * 12 + 12 * 20},
            {"id": 2, "category_id": 100, "isthing": False, "iscrowd": 0,
             "bbox": [0, 0, w, h], "area": h * w},
        ],
    }, ids


def test_panoptic_mapper_emits_bitmasks(tmp_path):
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.dataset_mapper import PanopticDatasetMapper

    d, ids = _write_panoptic_sample(str(tmp_path))
    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.INPUT.MIN_SIZE_TRAIN = [64]
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.RANDOM_FLIP = "none"
    mapper = PanopticDatasetMapper(cfg, is_train=True)
    out = mapper(d, np.random.RandomState(0))
    assert "bitmasks" in out and len(out["bitmasks"]) == len(out["boxes"]) == 1
    bm = out["bitmasks"][0]
    # no resize happened (already 64x96): bitmask == exact id-1 region
    np.testing.assert_array_equal(bm, (ids == 1).astype(np.float32))

    # collation rasterizes it into the strided canvas aligned with gt_boxes
    from cddmsl_tpu.data.build import pad_and_collate

    batch = pad_and_collate([out], (64, 96), max_gt=4, with_trgt=False, mask_stride=4)
    assert batch.gt_masks.shape == (1, 4, 16, 24)
    canvas = np.asarray(batch.gt_masks[0, 0])
    want = (ids == 1).astype(np.float32)[::4, ::4]
    np.testing.assert_array_equal(canvas, want)
    assert np.asarray(batch.gt_valid)[0, 0]


def test_combine_paints_mask_not_box():
    from cddmsl_tpu.models.panoptic_fpn import combine_semantic_and_instance_outputs

    H = W = 64
    sem = np.zeros((H, W), np.int64)
    boxes = np.asarray([[8.0, 8.0, 56.0, 56.0]], np.float32)
    scores = np.asarray([0.9], np.float32)
    classes = np.asarray([0], np.int64)
    valid = np.asarray([True])
    # box-space disc of radius ~0.35 box widths
    m = 28
    yy, xx = np.mgrid[0:m, 0:m]
    disc = (((yy - m / 2) ** 2 + (xx - m / 2) ** 2) < (0.35 * m) ** 2).astype(np.float32)

    pan_mask, segs_mask = combine_semantic_and_instance_outputs(
        boxes, scores, classes, valid, sem, stuff_area_limit=10**9, det_masks=disc[None]
    )
    pan_box, _ = combine_semantic_and_instance_outputs(
        boxes, scores, classes, valid, sem, stuff_area_limit=10**9
    )
    area_mask = (pan_mask == 1).sum()
    area_box = (pan_box == 1).sum()
    assert 0 < area_mask < 0.55 * area_box  # disc ~pi*0.35^2=0.38 of the rect
    assert not pan_mask[9, 9] and pan_box[9, 9]  # corner: box yes, disc no
    assert pan_mask[32, 32]  # disc center painted
    assert segs_mask and segs_mask[0]["isthing"]


def test_panoptic_fpn_mask_on_train_and_infer():
    from cddmsl_tpu.models.panoptic_fpn import PanopticFPN
    from cddmsl_tpu.utils.testing import materialize_params

    model = PanopticFPN(num_classes=3, sem_seg_classes=5, depth=10,
                        backbone_width=8, mask_on=True, mask_num_conv=1,
                        mask_conv_dim=8)
    r = np.random.RandomState(0)
    B, H, W, G = 1, 64, 96, 3
    gtb = np.zeros((B, G, 4), np.float32)
    gtv = np.zeros((B, G), bool)
    gtb[:, 0] = [8, 8, 56, 52]
    gtv[:, 0] = True
    batch = DetBatch(
        image=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        orig_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.asarray(r.randint(0, 3, (B, G)), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        gt_masks=jnp.ones((B, G, 16, 24), jnp.float32),
    )
    sem_gt = jnp.asarray(r.randint(0, 5, (B, H, W)), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_, bb: model.init({"params": r_}, bb, sem_gt, r_), rng, batch
    )
    losses = model.apply(params, batch, sem_gt, rng)
    assert "loss_mask" in losses and "loss_sem_seg" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    det, sem = model.apply(params, batch, method=model.inference)
    assert det.masks is not None and det.masks.shape[0] == B
    assert sem.shape == (B, H, W)
