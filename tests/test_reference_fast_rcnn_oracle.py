"""Reference-code-in-the-loop oracle for the RegionCLIP FastRCNNOutputLayers.

Imports the ACTUAL reference detectron2/modeling/roi_heads/fast_rcnn.py
(RegionCLIP's text-embedding classifier head — the CDDMSL-critical output
layer) via tests/_reference_shim.py and pins, with identical weights and
inputs on both sides:

  * forward(): cosine-similarity scores against frozen text embeddings with
    the zero background row and temperature (fast_rcnn.py:529-572) + box
    deltas, vs cddmsl_tpu/models/fast_rcnn.py FastRCNNOutputLayers
  * losses(): focal-scaled CE with background class weight + smooth-L1 box
    regression normalized by the total sampled count (fast_rcnn.py:574-690)
    vs fast_rcnn_losses
  * inference(): softmax -> per-class threshold -> class-aware NMS -> top-k
    (fast_rcnn.py:47-227, 691-724; batched_nms shimmed with the pure-torch
    torchvision-semantics NMS from _reference_shim) vs our static-shape
    fast_rcnn_inference_single_image, incl. the no_box_delta variant

The only non-reference code in the loop: the pure-torch batched_nms /
smooth_l1_loss shims (torchvision/fvcore are not installed), both of which
are independently pinned against our ops elsewhere (tests/test_ops.py,
test_reference_detops_oracle.py).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from _reference_shim import build_ref_pkg  # noqa: E402

NUM_CLASSES = 20
EMBED = 1024


@pytest.fixture(scope="module")
def refmods():
    mods = build_ref_pkg()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


@pytest.fixture(scope="module")
def ref_layer(refmods):
    torch.manual_seed(7)
    layer = refmods.fast_rcnn.FastRCNNOutputLayers(
        refmods.ShapeSpec(channels=EMBED),
        box2box_transform=refmods.box_regression.Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0)),
        num_classes=NUM_CLASSES,
        test_score_thresh=0.02,
        test_nms_thresh=0.5,
        test_topk_per_image=100,
        cls_agnostic_bbox_reg=False,
        smooth_l1_beta=0.0,
        box_reg_loss_type="smooth_l1",
        loss_weight=1.0,
        # (use_emb, weight_path=None -> random init we overwrite, roi-head
        # name selecting the 1024-dim input, emb dim)
        clip_cls_emb=(True, None, "CLIPRes5ROIHeads", EMBED),
        no_box_delta=False,
        bg_cls_loss_weight=0.2,
        multiply_rpn_score=(False, False),
        # (openset classes, openset emb path, temperature, focal gamma)
        openset_test=(None, None, 0.01, 0.5),
    )
    with torch.no_grad():
        layer.cls_score.weight.copy_(torch.randn(NUM_CLASSES, EMBED))
    return layer.eval()


def _our_params(ref_layer):
    return {
        "params": {
            "cls_score_weight": jnp.asarray(ref_layer.cls_score.weight.detach().numpy()),
            "bbox_pred": {
                "kernel": jnp.asarray(ref_layer.bbox_pred.weight.detach().numpy().T),
                "bias": jnp.asarray(ref_layer.bbox_pred.bias.detach().numpy()),
            },
        }
    }


def _our_layer():
    from cddmsl_tpu.models.fast_rcnn import FastRCNNOutputLayers

    return FastRCNNOutputLayers(
        num_classes=NUM_CLASSES, input_size=EMBED, use_text_emb=True, temperature=0.01
    )


def _forward_both(ref_layer, x):
    with torch.no_grad():
        want_scores, want_deltas = ref_layer(torch.from_numpy(x))
    got_scores, got_deltas = _our_layer().apply(_our_params(ref_layer), jnp.asarray(x))
    return (want_scores.numpy(), want_deltas.numpy()), (np.asarray(got_scores), np.asarray(got_deltas))


def test_forward_matches_reference(refmods, ref_layer, rng):
    x = rng.randn(64, EMBED).astype(np.float32)
    (want_s, want_d), (got_s, got_d) = _forward_both(ref_layer, x)
    # scores are cosine/0.01 in [-100, 100]
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=5e-5)


def _proposals(refmods, rng, n, h=480, w=640):
    x1 = rng.rand(n) * (w - 60)
    y1 = rng.rand(n) * (h - 60)
    bw = rng.rand(n) * 50 + 8
    bh = rng.rand(n) * 50 + 8
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32)
    inst = refmods.instances.Instances((h, w))
    inst.proposal_boxes = refmods.boxes.Boxes(torch.from_numpy(boxes))
    return inst, boxes


def test_losses_match_reference(refmods, ref_layer, rng):
    from cddmsl_tpu.models.fast_rcnn import fast_rcnn_losses
    from cddmsl_tpu.ops.box_regression import Box2BoxTransform

    per_img = 48
    insts, all_boxes, all_gt_boxes, all_gt_cls = [], [], [], []
    for _ in range(2):
        inst, boxes = _proposals(refmods, rng, per_img)
        gt_cls = rng.randint(0, NUM_CLASSES + 1, per_img).astype(np.int64)  # 20 = bg
        jitter = (rng.randn(per_img, 4) * 3.0).astype(np.float32)
        gt_boxes = boxes + jitter
        gt_boxes[:, 2:] = np.maximum(gt_boxes[:, 2:], gt_boxes[:, :2] + 1.0)
        inst.gt_classes = torch.from_numpy(gt_cls)
        inst.gt_boxes = refmods.boxes.Boxes(torch.from_numpy(gt_boxes))
        insts.append(inst)
        all_boxes.append(boxes)
        all_gt_boxes.append(gt_boxes)
        all_gt_cls.append(gt_cls)

    x = rng.randn(2 * per_img, EMBED).astype(np.float32)
    (want_s, want_d), (got_s, got_d) = _forward_both(ref_layer, x)
    want = ref_layer.losses((torch.from_numpy(want_s), torch.from_numpy(want_d)), insts)

    got = fast_rcnn_losses(
        jnp.asarray(got_s),
        jnp.asarray(got_d),
        jnp.asarray(np.concatenate(all_boxes)),
        jnp.asarray(np.concatenate(all_gt_boxes)),
        jnp.asarray(np.concatenate(all_gt_cls).astype(np.int32)),
        jnp.ones((2 * per_img,), bool),
        NUM_CLASSES,
        Box2BoxTransform((10.0, 10.0, 5.0, 5.0)),
        smooth_l1_beta=0.0,
        focal_gamma=0.5,
        bg_loss_weight=0.2,
    )
    np.testing.assert_allclose(float(got["loss_cls"]), want["loss_cls"].item(), rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_box_reg"]), want["loss_box_reg"].item(), rtol=1e-4)


@pytest.mark.parametrize("no_box_delta", [False, True])
def test_inference_matches_reference(refmods, ref_layer, rng, no_box_delta):
    from cddmsl_tpu.models.fast_rcnn import fast_rcnn_inference_single_image
    from cddmsl_tpu.ops.box_regression import Box2BoxTransform

    r, h, w = 300, 480, 640
    inst, boxes = _proposals(refmods, rng, r, h, w)
    x = rng.randn(r, EMBED).astype(np.float32)
    (want_s, want_d), (got_s, got_d) = _forward_both(ref_layer, x)

    ref_layer.no_box_delta = no_box_delta
    try:
        with torch.no_grad():
            results, _ = ref_layer.inference(
                (torch.from_numpy(want_s), torch.from_numpy(want_d)), [inst]
            )
    finally:
        ref_layer.no_box_delta = False
    res = results[0]
    want_boxes = res.pred_boxes.tensor.numpy()
    want_scores = res.scores.numpy()
    want_classes = res.pred_classes.numpy()

    det = fast_rcnn_inference_single_image(
        jnp.asarray(got_s),
        jnp.asarray(got_d),
        jnp.asarray(boxes),
        jnp.ones((r,), bool),
        jnp.asarray([h, w], jnp.int32),
        Box2BoxTransform((10.0, 10.0, 5.0, 5.0)),
        NUM_CLASSES,
        score_thresh=0.02,
        nms_thresh=0.5,
        topk_per_image=100,
        no_box_delta=no_box_delta,
    )
    valid = np.asarray(det.valid)
    got_boxes = np.asarray(det.boxes)[valid]
    got_scores = np.asarray(det.scores)[valid]
    got_classes = np.asarray(det.classes)[valid]

    assert len(got_scores) == len(want_scores), (len(got_scores), len(want_scores))
    # both are descending-score ordered (torchvision nms keep-order semantics)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got_classes, want_classes)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_inference_multiply_rpn_score_matches_reference(refmods, ref_layer, rng):
    """MODEL.CLIP.MULTIPLY_RPN_SCORE (reference fast_rcnn.py:707-710):
    class probabilities are multiplied by the RAW objectness logit and
    sqrt'd — proposals with negative objectness go NaN and are dropped by
    the reference's isfinite row filter (:153-157). Ours must reproduce
    both the weighting and the drop semantics."""
    from cddmsl_tpu.models.fast_rcnn import fast_rcnn_inference_single_image
    from cddmsl_tpu.ops.box_regression import Box2BoxTransform

    r, h, w = 200, 480, 640
    inst, boxes = _proposals(refmods, rng, r, h, w)
    # mixed-sign objectness: ~1/4 negative -> those proposals must vanish
    obj = (rng.randn(r) * 1.5 + 1.0).astype(np.float32)
    inst.objectness_logits = torch.from_numpy(obj)
    assert (obj < 0).sum() > 10
    x = rng.randn(r, EMBED).astype(np.float32)
    (want_s, want_d), (got_s, got_d) = _forward_both(ref_layer, x)

    ref_layer.multiply_rpn_score = True
    try:
        with torch.no_grad():
            results, _ = ref_layer.inference(
                (torch.from_numpy(want_s), torch.from_numpy(want_d)), [inst]
            )
    finally:
        ref_layer.multiply_rpn_score = False
    res = results[0]

    det = fast_rcnn_inference_single_image(
        jnp.asarray(got_s),
        jnp.asarray(got_d),
        jnp.asarray(boxes),
        jnp.ones((r,), bool),
        jnp.asarray([h, w], jnp.int32),
        Box2BoxTransform((10.0, 10.0, 5.0, 5.0)),
        NUM_CLASSES,
        score_thresh=0.02,
        nms_thresh=0.5,
        topk_per_image=100,
        rpn_scores=jnp.asarray(obj),
        multiply_rpn_score=True,
    )
    valid = np.asarray(det.valid)
    got_scores = np.asarray(det.scores)[valid]
    want_scores = res.scores.numpy()
    assert len(got_scores) == len(want_scores), (len(got_scores), len(want_scores))
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(det.classes)[valid], res.pred_classes.numpy())
    np.testing.assert_allclose(
        np.asarray(det.boxes)[valid], res.pred_boxes.tensor.numpy(), rtol=1e-4, atol=1e-3
    )
