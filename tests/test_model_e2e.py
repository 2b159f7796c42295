"""End-to-end model tests on synthetic data — the pattern of the reference's
tests/modeling/test_model_e2e.py:76-201 (random images + random GT, finite
losses, degenerate inputs), plus the CDDMSL branches the reference never
tested."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.models import DetBatch, build_model


def _small_cfg():
    cfg = get_cfg()
    # compile-light network (semantics under test don't depend on depth; the
    # full-size parameter structure is checked shape-only in test_param_count)
    cfg.TPU.BACKBONE_LAYERS = [1, 1, 1, 1]
    cfg.TPU.BACKBONE_WIDTH = 16
    cfg.TPU.EMBED_DIM = 128
    cfg.TPU.V2L_MAPPER_LAYERS = 2
    cfg.TPU.V2L_MAPPER_TOKENS = 8
    cfg.TPU.REMAT_BACKBONE = False
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER = True
    cfg.MODEL.CLIP.FOCAL_SCALED_LOSS = 0.5
    cfg.MODEL.CLIP.BG_CLS_LOSS_WEIGHT = 0.2
    cfg.MODEL.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.MODEL.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 512
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _batch(with_gt=True):
    B, H, W, G = 2, 128, 160, 8
    r = np.random.RandomState(0)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_valid = np.zeros((B, G), bool)
    if with_gt:
        gt_boxes[0, :2] = [[10, 10, 60, 60], [40, 20, 90, 80]]
        gt_boxes[1, :1] = [[5, 5, 50, 50]]
        gt_valid[0, :2] = True
        gt_valid[1, :1] = True
    return DetBatch(
        image=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[128, 160], [96, 120]], jnp.int32),
        orig_sizes=jnp.asarray([[256, 320], [192, 240]], jnp.int32),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.zeros((B, G), jnp.int32),
        gt_valid=jnp.asarray(gt_valid),
        image_trgt=jnp.asarray(np.random.RandomState(1).rand(B, H, W, 3) * 255, jnp.float32),
    )


@pytest.fixture(scope="module")
def model_and_params():
    from cddmsl_tpu.utils.testing import materialize_params

    model = build_model(_small_cfg())
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, _batch()
    )
    return model, params


def test_param_count():
    # FULL RN50 structure, shape-only (eval_shape executes nothing)
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER = True
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, _batch()
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    # 2x RN50 (~38.3M each w/ attnpool) + RPN + bbox head + mapper (~43M) + projectors
    assert 120e6 < n < 200e6


def test_supervised_losses_finite(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    losses = model.apply(params, _batch(), rng, method=model.supervised_losses)
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_rpn_cls", "loss_rpn_loc"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_supervised_losses_empty_gt(model_and_params):
    # reference test_model_e2e.py:104 — empty GT must still give finite losses
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    losses = model.apply(params, _batch(with_gt=False), rng, method=model.supervised_losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_rpn_loc"]) == 0.0  # no positive anchors


def test_caption_consistency(model_and_params):
    model, params = model_and_params
    out = model.apply(params, _batch(), True, method=model.caption_consistency)
    assert np.isfinite(float(out["cont_loss"]))
    assert np.isfinite(float(out["kd_loss"]))
    # untrained projections of 2 random images: InfoNCE ~= ln(2)
    assert abs(float(out["cont_loss"]) - math.log(2)) < 0.2

    out2 = model.apply(params, _batch(), False, method=model.caption_consistency)
    assert "kd_loss" not in out2


def test_caption_consistency_region(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(2)
    out = model.apply(params, _batch(), rng, method=model.caption_consistency_region)
    v = float(out["cont_loss_region"])
    assert np.isfinite(v)
    # 2 images x 16 regions -> InfoNCE over 32 rows ~= ln(32) at init
    assert abs(v - math.log(32)) < 0.5


def test_image_consistency_branches(model_and_params):
    model, params = model_and_params
    out = model.apply(params, _batch(), method=model.image_consistency)
    assert np.isfinite(float(out["cont_loss"]))
    out = model.apply(
        params, _batch(), jax.random.PRNGKey(3), method=model.image_consistency_region
    )
    assert np.isfinite(float(out["cont_loss"]))


def test_supervised_target_branch(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(4)
    losses = model.apply(params, _batch(), rng, True, method=model.supervised_losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_inference_shapes_and_postprocess(model_and_params):
    model, params = model_and_params
    det = model.apply(params, _batch(), method=model.inference)
    assert det.boxes.shape == (2, 100, 4)
    assert det.scores.shape == (2, 100)
    b = np.asarray(det.boxes)
    valid = np.asarray(det.valid)
    orig = np.asarray(_batch().orig_sizes)
    for i in range(2):
        vb = b[i][valid[i]]
        if len(vb):
            assert (vb[:, 0] >= 0).all() and (vb[:, 1] >= 0).all()
            assert (vb[:, 2] <= orig[i, 1] + 1e-3).all()
            assert (vb[:, 3] <= orig[i, 0] + 1e-3).all()
    s = np.asarray(det.scores)
    assert ((s >= 0) & (s <= 1)).all()


def test_plain_d2_resnet_faster_rcnn():
    """The plain Faster R-CNN baseline (reference faster_rcnn_R_50_C4.yaml:
    build_resnet_backbone + linear classifier, no CLIP towers)."""
    from cddmsl_tpu.utils.testing import materialize_params

    cfg = _small_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER = False
    cfg.MODEL.RESNETS.DEPTH = 10  # compile-light spec
    cfg.TPU.BACKBONE_LAYERS = []
    cfg.TPU.BACKBONE_WIDTH = 0
    cfg.TPU.EMBED_DIM = 0
    cfg.TPU.ENABLE_CAPTION_CONSISTENCY = False
    model = build_model(cfg)
    assert model.backbone_type == "d2_resnet"
    assert not model.with_offline_backbone
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, _batch()
    )
    losses = model.apply(params, _batch(), rng, method=model.supervised_losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    det = model.apply(params, _batch(), method=model.inference)
    assert det.boxes.shape == (2, 100, 4)
