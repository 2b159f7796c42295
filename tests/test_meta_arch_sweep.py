"""Meta-arch completeness sweep (VERDICT round-1 item 8): PanopticFPN,
CascadeROIHeads, KeypointROIHeads assembly, RRPN + rotated heads — each with
a synthetic e2e check (the reference test_model_e2e.py pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch
from cddmsl_tpu.utils.testing import materialize_params


def test_rotated_fast_rcnn_e2e():
    from cddmsl_tpu.models.rotated_rcnn import RotatedDetBatch, RotatedFastRCNN

    model = RotatedFastRCNN(num_classes=5, depth=10)
    b, h, w, g = 1, 64, 64, 3
    r = np.random.RandomState(0)
    gt = np.zeros((b, g, 5), np.float32)
    gt[0, 0] = [30, 30, 20, 12, 15.0]
    gt[0, 1] = [45, 20, 14, 10, -30.0]
    batch = RotatedDetBatch(
        image=jnp.asarray(r.rand(b, h, w, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.asarray(gt),
        gt_classes=jnp.asarray(r.randint(0, 5, (b, g)), jnp.int32),
        gt_valid=jnp.asarray([[True, True, False]]),
    )
    rng = jax.random.PRNGKey(0)
    params = materialize_params(lambda r_, bb: model.init({"params": r_}, bb, r_), rng, batch)
    losses = model.apply(params, batch, rng)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape[-1] == 5
    a = np.asarray(det.boxes[..., 4])
    assert ((a >= -180) & (a <= 180)).all()


def test_rotated_box_transform_roundtrip():
    from cddmsl_tpu.ops.box_regression import Box2BoxTransformRotated

    t = Box2BoxTransformRotated()
    src = jnp.asarray([[30.0, 30, 20, 12, 10], [50, 40, 8, 16, -170]])
    tgt = jnp.asarray([[32.0, 28, 22, 10, 25], [48, 44, 10, 12, 175]])
    deltas = t.get_deltas(src, tgt)
    back = t.apply_deltas(deltas, src)
    np.testing.assert_allclose(np.asarray(back)[:, :4], np.asarray(tgt)[:, :4], atol=1e-4)
    # angles equal mod 360
    da = (np.asarray(back)[:, 4] - np.asarray(tgt)[:, 4] + 180) % 360 - 180
    np.testing.assert_allclose(da, 0, atol=1e-4)


def test_cascade_roi_heads():
    from cddmsl_tpu.models.cascade_rcnn import CascadeROIHeads
    from cddmsl_tpu.models.rpn import Proposals

    heads = CascadeROIHeads(num_classes=4, in_channels=8, batch_size_per_image=16,
                            detections_per_image=10)
    b, hgt, wid, k, g = 1, 16, 24, 12, 3
    r = np.random.RandomState(0)
    features = jnp.asarray(r.rand(b, hgt, wid, 8).astype(np.float32))
    pboxes = np.zeros((b, k, 4), np.float32)
    pboxes[0, :, 0] = r.rand(k) * 100
    pboxes[0, :, 1] = r.rand(k) * 100
    pboxes[0, :, 2] = pboxes[0, :, 0] + 20 + r.rand(k) * 100
    pboxes[0, :, 3] = pboxes[0, :, 1] + 20 + r.rand(k) * 100
    proposals = Proposals(
        boxes=jnp.asarray(pboxes),
        scores=jnp.asarray(r.rand(b, k).astype(np.float32)),
        valid=jnp.ones((b, k), bool),
    )
    gt_boxes = jnp.asarray([[[10, 10, 60, 60], [100, 100, 200, 180], [0, 0, 0, 0.0]]])
    gt_classes = jnp.asarray([[0, 2, 0]])
    gt_valid = jnp.asarray([[True, True, False]])
    sizes = jnp.asarray([[256, 384]], jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_: heads.init(
            {"params": r_}, features, proposals, sizes, True,
            gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid, rng=r_,
        ),
        rng,
    )
    _, losses = heads.apply(
        params, features, proposals, sizes, True,
        gt_boxes=gt_boxes, gt_classes=gt_classes, gt_valid=gt_valid, rng=rng,
    )
    assert {f"loss_cls_stage{i}" for i in range(3)} <= set(losses)
    assert {f"loss_box_reg_stage{i}" for i in range(3)} <= set(losses)
    for key, v in losses.items():
        assert np.isfinite(float(v)), key
    det, _ = heads.apply(params, features, proposals, sizes, False)
    assert det.boxes.shape == (1, 10, 4)
    s = np.asarray(det.scores)
    assert ((s >= 0) & (s <= 1 + 1e-5)).all()


def test_keypoint_roi_heads():
    from cddmsl_tpu.models.extra_meta_archs import KeypointROIHeads

    heads = KeypointROIHeads(num_keypoints=5, conv_dims=(16, 16))
    b, s = 1, 4
    r = np.random.RandomState(0)
    features = jnp.asarray(r.rand(b, 16, 24, 8).astype(np.float32))
    boxes = jnp.asarray([[[10, 10, 90, 90], [40, 20, 120, 100], [0, 0, 64, 64], [5, 5, 50, 50.0]]])
    fg = jnp.asarray([[True, True, False, True]])
    kps = np.zeros((b, s, 5, 3), np.float32)
    kps[0, :, :, 0] = 30 + r.rand(s, 5) * 40
    kps[0, :, :, 1] = 30 + r.rand(s, 5) * 40
    kps[0, :, :, 2] = 2  # visible
    kps = jnp.asarray(kps)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_: heads.init({"params": r_}, features, boxes, fg, kps, method=heads.losses), rng
    )
    losses = heads.apply(params, features, boxes, fg, kps, method=heads.losses)
    assert np.isfinite(float(losses["loss_keypoint"]))
    out = heads.apply(params, features, boxes, method=heads.inference)
    assert out.shape == (b, s, 5, 3)
    xy = np.asarray(out[..., :2])
    assert np.isfinite(xy).all()


def test_panoptic_fpn_e2e():
    from cddmsl_tpu.models.panoptic_fpn import (
        PanopticFPN,
        combine_semantic_and_instance_outputs,
    )

    model = PanopticFPN(num_classes=4, sem_seg_classes=6, depth=10)
    batch = _synthetic_batch(1, 64, 64, g=3)
    r = np.random.RandomState(0)
    sem_gt = jnp.asarray(r.randint(0, 6, (1, 64, 64)), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_, bb: model.init({"params": r_}, bb, sem_gt, r_), rng, batch
    )
    losses = model.apply(params, batch, sem_gt, rng)
    assert "loss_sem_seg" in losses and "loss_cls" in losses and "loss_rpn_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    det, sem = model.apply(params, batch, method=model.inference)
    assert sem.shape == (1, 64, 64)

    pan, segs = combine_semantic_and_instance_outputs(
        np.asarray(det.boxes[0]), np.asarray(det.scores[0]), np.asarray(det.classes[0]),
        np.asarray(det.valid[0]), np.asarray(sem[0]), stuff_area_limit=16,
    )
    assert pan.shape == (64, 64)
    ids = {s["id"] for s in segs}
    assert set(np.unique(pan)) - {0} == ids


def test_regnet_backbone():
    from cddmsl_tpu.models.backbone.regnet import RegNet, generate_regnet_parameters

    ws, ds, gw = generate_regnet_parameters(24.48, 24, 2.54, 22, 16)
    assert len(ws) == len(ds) <= 4 and sum(ds) == 22
    assert all(w % gw == 0 for w in ws)

    # w_a=16, w_0=16, w_m=2, depth=8 -> 4 stages [16, 32, 64, 128]
    m = RegNet(w_a=16.0, w_0=16, w_m=2.0, depth=8, group_width=8,
               out_features=("s3", "s4"))
    x = jnp.zeros((1, 64, 64, 3))
    params = materialize_params(lambda r: m.init(r, x), jax.random.PRNGKey(0))
    out = m.apply(params, x)
    assert set(out) == {"s3", "s4"}
    assert out["s4"].shape[1] == 64 // 32

    # RegNetY (SE) variant builds and runs too
    my = RegNet(w_a=16.0, w_0=16, w_m=2.0, depth=8, group_width=8, se_ratio=0.25,
                out_features=("s4",))
    py = materialize_params(lambda r: my.init(r, x), jax.random.PRNGKey(1))
    assert my.apply(py, x)["s4"].shape[-1] > 0


def test_basic_block_resnet18():
    from cddmsl_tpu.models.backbone.resnet import D2ResNet

    m = D2ResNet(depth=18, out_features=("res4", "res5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = materialize_params(lambda r: m.init(r, x), jax.random.PRNGKey(0))
    out = m.apply(params, x)
    # BasicBlock: res2 out = 64 -> res4 = 256, res5 = 512 channels
    assert out["res4"].shape[-1] == 256
    assert out["res5"].shape[-1] == 512
