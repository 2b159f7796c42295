"""Cascade Mask R-CNN on the FPN family (reference configs/Misc/
cascade_mask_rcnn_R_50_FPN_1x.yaml: Base-RCNN-FPN + ROI_HEADS.NAME=
CascadeROIHeads + class-agnostic deltas + mask head)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.models import DetBatch  # noqa: E402


def _batch(g=2):
    r = np.random.RandomState(0)
    h, w = 64, 96
    gtb = np.asarray([[[8, 8, 40, 40], [50, 20, 90, 60]]], np.float32)[:, :g]
    return DetBatch(
        image=jnp.asarray(r.rand(1, h, w, 3).astype(np.float32) * 255),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        orig_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.asarray([[0, 1]], jnp.int32)[:, :g],
        gt_valid=jnp.ones((1, g), bool),
        gt_masks=jnp.ones((1, g, 16, 24), jnp.float32),
    )


def _tiny_cascade_fpn():
    from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

    return FPNRCNN(
        num_classes=3,
        depth=10,
        backbone_width=8,
        res2_out_channels=32,
        fpn_out_channels=32,
        cascade=True,
        mask_on=True,
        mask_num_conv=1,
        mask_conv_dim=16,
        rpn_pre_nms_topk=(64, 32),
        rpn_post_nms_topk=(32, 16),
        roi_batch_size_per_image=16,
        detections_per_image=8,
        pixel_mean=(103.53, 116.28, 123.675),
        pixel_std=(1.0, 1.0, 1.0),
    )


def test_cascade_fpn_train_and_inference():
    model = _tiny_cascade_fpn()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)

    losses = model.apply(params, batch, jax.random.PRNGKey(1), method=model.supervised_losses)
    for i in range(3):
        assert f"loss_cls_stage{i}" in losses and f"loss_box_reg_stage{i}" in losses
    assert "loss_mask" in losses and "loss_rpn_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    # gradients flow to every cascade stage and the mask head
    def total(p):
        ls = model.apply(p, batch, jax.random.PRNGKey(1), method=model.supervised_losses)
        return sum(jnp.sum(v) for v in ls.values())

    grads = jax.grad(total)(params)["params"]["roi_heads"]
    for i in range(3):
        g = grads[f"stage{i}"]["cls_score"]["kernel"]
        assert float(jnp.abs(g).sum()) > 0, f"stage{i} got no gradient"
    assert float(jnp.abs(grads["mask_head"]["predictor"]["kernel"]).sum()) > 0

    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape == (1, 8, 4)
    assert det.masks is not None and det.masks.shape[:2] == (1, 8)
    assert np.isfinite(np.asarray(det.masks)).all()
    assert (np.asarray(det.masks) >= 0).all() and (np.asarray(det.masks) <= 1).all()


def test_cascade_fpn_from_config():
    """The Misc cascade_mask yaml builds an FPNRCNN with cascade heads, and
    the cascade C4 path is unaffected."""
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.models import build_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, "Misc", "cascade_mask_rcnn_R_50_FPN_1x.yaml"))
    m = build_model(cfg)
    assert type(m).__name__ == "FPNRCNN" and m.cascade and m.mask_on

    cfg2 = get_cfg()
    cfg2.merge_from_file(os.path.join(root, "Misc", "cascade_mask_rcnn_X_152_32x8d_FPN_IN5k_gn_dconv.yaml"))
    m2 = build_model(cfg2)
    assert m2.cascade and m2.depth == 152 and m2.num_groups == 32
    assert tuple(m2.deform_on_per_stage) == (False, True, True, True)

    cfg3 = get_cfg()
    cfg3.merge_from_file(os.path.join(root, "Misc", "cascade_rcnn_R_50_C4_1x.yaml"))
    m3 = build_model(cfg3)
    assert type(m3).__name__ == "CascadeRCNN"
