"""End-to-end mask path: MASK_ON training loss, eval mask outputs, GT
crop parity, RLE codec, and COCO segm AP on a perfect-prediction fixture
(reference wiring: roi_heads.py:480-534 Res5ROIHeads mask branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.models import build_model
from cddmsl_tpu.models.mask_head import crop_mask_targets
from cddmsl_tpu.utils.testing import materialize_params


@pytest.fixture(scope="module")
def mask_setup():
    cfg = _flagship_cfg(tiny=True)
    cfg.MODEL.MASK_ON = True
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b = _synthetic_batch(2, 64, 96, g=4)
    # box-aligned rectangular GT masks at stride 4
    stride = cfg.TPU.MASK_CANVAS_STRIDE
    gt_masks = np.zeros((2, 4, 64 // stride, 96 // stride), np.float32)
    boxes = np.asarray(b.gt_boxes)
    valid = np.asarray(b.gt_valid)
    for i in range(2):
        for g in range(4):
            if valid[i, g]:
                x1, y1, x2, y2 = (boxes[i, g] / stride).astype(int)
                gt_masks[i, g, y1:y2, x1:x2] = 1.0
    b = b._replace(gt_masks=jnp.asarray(gt_masks))
    params = materialize_params(
        lambda r, bb: model.init({"params": r}, bb, r, method=model.init_all), rng, b
    )
    return cfg, model, params, b


def test_mask_training_loss(mask_setup):
    cfg, model, params, b = mask_setup
    losses = model.apply(params, b, jax.random.PRNGKey(1), method=model.supervised_losses)
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    assert float(losses["loss_mask"]) > 0


def test_mask_inference_outputs(mask_setup):
    cfg, model, params, b = mask_setup
    det = model.apply(params, b, method=model.inference)
    assert det.masks is not None
    bsz, d = det.boxes.shape[:2]
    m = det.masks.shape[-1]
    assert det.masks.shape == (bsz, d, m, m)
    probs = np.asarray(det.masks)
    assert np.isfinite(probs).all() and (probs >= 0).all() and (probs <= 1).all()


def test_crop_mask_targets_box_aligned():
    """A full-canvas mask cropped to any box is all ones; an empty canvas all
    zeros (the BitMasks.crop_and_resize >= 0.5 semantics)."""
    canvas = jnp.ones((2, 16, 24))
    idx = jnp.asarray([0, 1, 0])
    boxes = jnp.asarray([[4.0, 4, 40, 40], [8, 8, 64, 48], [0, 0, 96, 64]])
    out = crop_mask_targets(canvas, idx, boxes, out_size=8, stride=4.0)
    assert out.shape == (3, 8, 8)
    np.testing.assert_array_equal(np.asarray(out), 1.0)
    out0 = crop_mask_targets(jnp.zeros((2, 16, 24)), idx, boxes, out_size=8, stride=4.0)
    np.testing.assert_array_equal(np.asarray(out0), 0.0)


def test_rle_roundtrip_and_iou():
    from cddmsl_tpu.evaluation.masks import mask_iou_matrix, rle_area, rle_decode, rle_encode

    r = np.random.RandomState(0)
    m1 = r.rand(13, 17) > 0.5
    rle = rle_encode(m1)
    np.testing.assert_array_equal(rle_decode(rle), m1)
    assert rle_area(rle) == int(m1.sum())

    m2 = np.zeros((13, 17), bool)
    m2[2:10, 3:12] = True
    iou = mask_iou_matrix([rle_encode(m2)], [rle_encode(m2)], np.array([False]))
    assert abs(iou[0, 0] - 1.0) < 1e-9
    iou2 = mask_iou_matrix([rle_encode(m1)], [rle_encode(m2)], np.array([False]))
    exact = (m1 & m2).sum() / (m1 | m2).sum()
    assert abs(iou2[0, 0] - exact) < 1e-9


def test_paste_np_matches_jax():
    from cddmsl_tpu.evaluation.masks import paste_masks_np
    from cddmsl_tpu.models.mask_head import paste_masks_in_image

    r = np.random.RandomState(1)
    masks = r.rand(3, 14, 14).astype(np.float32)
    boxes = np.asarray([[5.0, 5, 25, 20], [0, 0, 30, 30], [10, 2, 28, 31]], np.float32)
    a = paste_masks_np(masks, boxes, (32, 32))
    bmask = np.asarray(paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (32, 32)))
    np.testing.assert_array_equal(a, bmask)


def test_coco_segm_ap_perfect():
    """Perfect mask predictions -> segm AP 100 on a synthetic fixture."""
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator

    name = "_segm_fixture"
    if MetadataCatalog.get(name).get("thing_classes") is None:
        MetadataCatalog.get(name).set(thing_classes=["a", "b"], evaluator_type="coco")
    ev = COCOEvaluator(name, tasks=("bbox", "segm"))
    hw = (40, 50)
    # two GT instances as polygons (axis-aligned rectangles)
    polys = [
        [[5, 5, 25, 5, 25, 20, 5, 20]],
        [[10, 22, 40, 22, 40, 38, 10, 38]],
    ]
    gb = np.asarray([[5, 5, 25, 20], [10, 22, 40, 38]], np.float32)
    gc = np.asarray([0, 1])
    ev.process_gt("img0", gb, gc, segmentations=polys, image_hw=hw)
    # detections: box-space solid masks, i.e. exactly the GT rectangles
    masks = np.ones((2, 14, 14), np.float32)
    ev.process("img0", gb, np.asarray([0.9, 0.8]), gc, masks=masks, image_hw=hw)
    res = ev.evaluate()
    assert res["bbox"]["AP"] > 99.0
    assert res["segm"]["AP50"] > 99.0
    # solid-paste vs polygon-raster differ by boundary pixels only
    assert res["segm"]["AP"] > 60.0


def test_fpn_mask_branch():
    """CLIPStandardROIHeads mask branch (reference StandardROIHeads mask
    pooler + 4-conv head)."""
    from cddmsl_tpu.models.roi_heads import CLIPStandardROIHeads
    from cddmsl_tpu.models.rpn import Proposals

    heads = CLIPStandardROIHeads(
        num_classes=3, use_text_emb=False, emb_dim=64, fc_dim=32,
        batch_size_per_image=8, mask_on=True, mask_num_conv=1, mask_conv_dim=8,
        mask_canvas_stride=4.0, detections_per_image=8,
    )
    b = 1
    r = np.random.RandomState(0)
    fpn = [jnp.asarray(r.rand(b, 32 // (2 ** i), 48 // (2 ** i), 8).astype(np.float32)) for i in range(4)]
    k = 6
    pboxes = np.zeros((b, k, 4), np.float32)
    pboxes[0, :, 0] = r.rand(k) * 40
    pboxes[0, :, 1] = r.rand(k) * 30
    pboxes[0, :, 2] = pboxes[0, :, 0] + 20
    pboxes[0, :, 3] = pboxes[0, :, 1] + 20
    proposals = Proposals(jnp.asarray(pboxes), jnp.asarray(r.rand(b, k).astype(np.float32)),
                          jnp.ones((b, k), bool))
    gt_boxes = jnp.asarray([[[8, 8, 40, 40.0], [60, 40, 100, 90]]])
    gt_classes = jnp.asarray([[0, 2]])
    gt_valid = jnp.asarray([[True, True]])
    gt_masks = jnp.ones((b, 2, 32, 48))
    sizes = jnp.asarray([[128, 192]], jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_: heads.init(
            {"params": r_}, fpn, proposals, sizes, True,
            gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid,
            gt_masks=gt_masks, rng=r_,
        ),
        rng,
    )
    _, losses = heads.apply(
        params, fpn, proposals, sizes, True,
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid,
        gt_masks=gt_masks, rng=rng,
    )
    assert "loss_mask" in losses and np.isfinite(float(losses["loss_mask"]))
    det, _ = heads.apply(params, fpn, proposals, sizes, False)
    assert det.masks is not None and det.masks.shape[:2] == (b, 8)


def test_coco_compressed_rle_decode():
    """Compressed-string RLE counts (pycocotools LEB128 variant) decode to
    the same mask as the uncompressed list form."""
    from cddmsl_tpu.evaluation.masks import coco_rle_to_bitmask, rle_decode, rle_encode

    def encode_counts(counts):
        # inverse of _decode_compressed_counts (pycocotools rleToString)
        s = []
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
                if more:
                    c |= 0x20
                s.append(chr(c + 48))
        return "".join(s)

    r = np.random.RandomState(3)
    m = r.rand(17, 11) > 0.5
    rle = rle_encode(m)
    compressed = {"size": rle["size"], "counts": encode_counts(list(rle["counts"]))}
    np.testing.assert_array_equal(coco_rle_to_bitmask(compressed), m)
    np.testing.assert_array_equal(coco_rle_to_bitmask(rle), m)


def test_native_paste_masks_parity():
    """csrc/maskops.cpp paste_masks is pixel-exact vs the numpy mirror
    (same +0.5 center / clip / bilinear / strict-threshold math)."""
    import cddmsl_tpu.evaluation.masks as M
    from cddmsl_tpu.csrc import build as csrc_build

    r = np.random.RandomState(3)
    n, m, H, W = 10, 28, 96, 128
    masks = r.rand(n, m, m).astype(np.float32)
    boxes = np.zeros((n, 4))
    boxes[:, 0] = r.rand(n) * 80
    boxes[:, 1] = r.rand(n) * 60
    boxes[:, 2] = boxes[:, 0] + 4 + r.rand(n) * 45
    boxes[:, 3] = boxes[:, 1] + 4 + r.rand(n) * 35
    # out-of-canvas box edge cases
    boxes[0] = [-10, -10, 30, 30]
    boxes[1] = [100, 70, 200, 200]

    got = M.paste_masks_np(masks, boxes, (H, W))
    if csrc_build.load_native("maskops") is None:
        pytest.skip("no native toolchain")
    orig = csrc_build.load_native
    csrc_build.load_native = lambda name="x": None
    try:
        want = M.paste_masks_np(masks, boxes, (H, W))
    finally:
        csrc_build.load_native = orig
    np.testing.assert_array_equal(got, want)
