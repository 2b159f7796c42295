"""FPN Faster/Mask R-CNN family (models/fpn_rcnn.py + models/rpn.py FPNRPN):
the reference's Base-RCNN-FPN config surface (detectron2 configs/
Base-RCNN-FPN.yaml -> GeneralizedRCNN + build_resnet_fpn_backbone +
multi-level RPN + StandardROIHeads). Covers: FPNRPN anchor/level math and
cross-level NMS isolation, config-driven build dispatch, a train loss step
(boxes + masks), and the inference path end-to-end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.models import DetBatch, build_model

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _tiny_cfg(rel):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, rel))
    cfg.MODEL.RESNETS.DEPTH = 10
    cfg.TPU.BACKBONE_WIDTH = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    return cfg


def _batch(g=3, with_masks=False):
    B, H, W = 2, 64, 96
    r = np.random.RandomState(0)
    gtb = np.zeros((B, g, 4), np.float32)
    gtv = np.zeros((B, g), bool)
    gtb[:, 0] = [8, 8, 56, 52]
    gtb[:, 1] = [30, 20, 90, 60]
    gtv[:, :2] = True
    return DetBatch(
        image=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        orig_sizes=jnp.asarray([[2 * H, 2 * W]] * B, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.asarray(r.randint(0, 80, (B, g)), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        gt_masks=jnp.asarray(np.ones((B, g, 16, 24), np.float32)) if with_masks else None,
    )


def test_build_dispatch_fpn():
    cfg = _tiny_cfg("COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml")
    model = build_model(cfg)
    assert type(model).__name__ == "FPNRCNN"
    assert not model.mask_on


def test_build_dispatch_mask_fpn():
    for rel in (
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
        "Cityscapes/mask_rcnn_R_50_FPN.yaml",
        "LVISv1-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
        "LVISv0.5-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml",
    ):
        model = build_model(_tiny_cfg(rel))
        assert type(model).__name__ == "FPNRCNN" and model.mask_on, rel


def test_keypoint_fpn_e2e():
    """Keypoint branch on the FPN heads (reference Base-Keypoint-RCNN-FPN):
    loss on matched GT keypoints at train, decoded (x, y, score) keypoints
    on the final boxes at inference, rescaled by postprocess."""
    cfg = _tiny_cfg("COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.yaml")
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    model = build_model(cfg)
    assert type(model).__name__ == "FPNRCNN" and model.keypoint_on

    B, g, K = 2, 3, cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS
    base = _batch(g=g)
    r = np.random.RandomState(1)
    kp = np.zeros((B, g, K, 3), np.float32)
    kp[..., 0] = r.uniform(10, 50, (B, g, K))
    kp[..., 1] = r.uniform(10, 50, (B, g, K))
    kp[..., 2] = 2.0
    batch = base._replace(
        gt_classes=np.zeros((B, g), np.int32),  # single 'person' class
        gt_keypoints=jnp.asarray(kp),
    )
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    assert "loss_keypoint" in losses and np.isfinite(float(losses["loss_keypoint"]))

    det = jax.device_get(model.apply(params, batch, method=model.inference))
    D = det.boxes.shape[1]
    assert det.keypoints is not None and det.keypoints.shape == (B, D, K, 3)
    keep = np.asarray(det.valid)
    if keep.any():
        k = np.asarray(det.keypoints)[keep]
        assert np.isfinite(k).all()
        # decoded coords rescaled into the 2x original frame
        assert (k[..., 0] <= 2 * 96 + 1).all() and (k[..., 1] <= 2 * 64 + 1).all()


def test_detectron1_comparison_config_builds():
    cfg = _tiny_cfg("Detectron1-Comparisons/faster_rcnn_R_50_FPN_noaug_1x.yaml")
    model = build_model(cfg)
    assert type(model).__name__ == "FPNRCNN" and not model.mask_on
    assert cfg.MODEL.RPN.SMOOTH_L1_BETA == 0.1111
    assert list(cfg.INPUT.MIN_SIZE_TRAIN) == [800]  # no scale aug


def test_pascal_voc_configs_build():
    m1 = build_model(_tiny_cfg("PascalVOC-Detection/faster_rcnn_R_50_C4.yaml"))
    assert type(m1).__name__ == "GeneralizedRCNN"
    m2 = build_model(_tiny_cfg("PascalVOC-Detection/faster_rcnn_R_50_FPN.yaml"))
    assert type(m2).__name__ == "FPNRCNN" and m2.num_classes == 20


def test_fpnrpn_level_isolation():
    """Cross-level NMS must not suppress across levels: two identical boxes
    from different levels both survive (batched_nms level-offset trick,
    reference layers/nms.py:16-43)."""
    from cddmsl_tpu.ops.nms import nms

    bx = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    sc = jnp.asarray([0.9, 0.8], jnp.float32)
    lv = jnp.asarray([0, 1], jnp.int32)
    off = lv.astype(jnp.float32)[:, None] * 101.0
    idx, valid = nms(bx + off, sc, 0.5, 2, valid=jnp.asarray([True, True]))
    assert int(valid.sum()) == 2
    # same level -> the lower-scored duplicate IS suppressed
    idx, valid = nms(bx, sc, 0.5, 2, valid=jnp.asarray([True, True]))
    assert int(valid.sum()) == 1


@pytest.fixture(scope="module")
def fpn_setup():
    cfg = _tiny_cfg("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml")
    model = build_model(cfg)
    batch = _batch(with_masks=True)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    return cfg, model, params, batch


def test_fpn_train_losses(fpn_setup):
    cfg, model, params, batch = fpn_setup
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg", "loss_mask"):
        assert k in losses, (k, list(losses))
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))


def test_fpn_trainer_protocol(fpn_setup):
    """cddmsl_losses ignores the caption gates -> plugs into make_train_step."""
    cfg, model, params, batch = fpn_setup
    from cddmsl_tpu.engine import TrainState, make_train_step
    from cddmsl_tpu.solver import build_optimizer

    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, optimizer, enable_caption=False, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    moved = any(
        bool(np.any(np.asarray(a) != np.asarray(b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(new_state.params),
        )
    )
    assert moved


def test_fpn_inference(fpn_setup):
    cfg, model, params, batch = fpn_setup
    from cddmsl_tpu.engine import make_eval_step

    det = jax.device_get(make_eval_step(model)(params, batch))
    B, D = det.boxes.shape[:2]
    assert B == 2 and D == cfg.TEST.DETECTIONS_PER_IMAGE
    assert det.masks is not None and det.masks.shape[:2] == (B, D)
    # postprocess rescaled into the 2x original frame
    keep = np.asarray(det.valid)
    if keep.any():
        bx = np.asarray(det.boxes)[keep]
        assert (bx[:, 2] <= 2 * 96 + 1e-3).all() and (bx[:, 3] <= 2 * 64 + 1e-3).all()


def test_dc5_config_builds():
    """Base-RCNN-DilatedC5 dispatch (reference configs/Base-RCNN-DilatedC5
    .yaml): RES5_DILATION=2 routes GeneralizedRCNN to the single-level
    FPNRCNN assembly with all five anchor sizes on the one level."""
    for rel, mask in (
        ("COCO-Detection/faster_rcnn_R_50_DC5_1x.yaml", False),
        ("COCO-Detection/faster_rcnn_R_101_DC5_3x.yaml", False),
        ("COCO-InstanceSegmentation/mask_rcnn_R_50_DC5_1x.yaml", True),
    ):
        m = build_model(_tiny_cfg(rel))
        assert type(m).__name__ == "FPNRCNN" and m.dc5 and m.mask_on == mask, rel
        assert tuple(m.anchor_sizes) == (32, 64, 128, 256, 512)


def test_dc5_e2e():
    """Tiny DC5 Mask R-CNN: dilated stride-16 res5 is the only feature map
    (backbone has no FPN params, res5 spatial = H/16), 15 anchors per cell
    on the single level, train losses finite incl. mask, inference decodes
    detections + masks in the postprocessed frame."""
    cfg = _tiny_cfg("COCO-InstanceSegmentation/mask_rcnn_R_50_DC5_1x.yaml")
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128  # single level: give NMS headroom
    cfg.TPU.BACKBONE_WIDTH = 4
    model = build_model(cfg).clone(res2_out_channels=32)  # light res5 = 256ch
    batch = _batch(with_masks=True)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    assert "fpn" not in params["params"]
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg", "loss_mask"):
        assert k in losses and np.isfinite(float(losses[k])), (k, losses.get(k))
    # res5 keeps stride 16 under the dilation
    feats = model.apply(params, batch.image, method=model._features)[0]
    assert feats[0].shape[1:3] == (64 // 16, 96 // 16)
    det = jax.device_get(model.apply(params, batch, method=model.inference))
    assert det.boxes.shape[1] == cfg.TEST.DETECTIONS_PER_IMAGE
    assert det.masks is not None
    keep = np.asarray(det.valid)
    if keep.any():
        bx = np.asarray(det.boxes)[keep]
        assert (bx[:, 2] <= 2 * 96 + 1e-3).all() and (bx[:, 3] <= 2 * 64 + 1e-3).all()


def test_fpn_proposal_network():
    """rpn_R_50_FPN_1x: RPN-only ProposalNetwork on the FPN backbone —
    builds from config, trains one loss step, emits proposals."""
    cfg = _tiny_cfg("COCO-Detection/rpn_R_50_FPN_1x.yaml")
    model = build_model(cfg)
    assert type(model).__name__ == "FPNProposalNetwork"
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng)
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    props = model.apply(params, batch, method=model.inference)
    assert props.boxes.shape == (2, cfg.MODEL.RPN.POST_NMS_TOPK_TEST, 4)
    assert bool(np.asarray(props.valid).any())


def test_giou_config_e2e():
    """mask_rcnn_R_50_FPN_1x_giou: giou box regression in BOTH the RPN
    (decoded anchors, weight 2.0) and the ROI head (weight 10.0). The
    weights verifiably scale the loc losses; all losses finite."""
    cfg = _tiny_cfg("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x_giou.yaml")
    assert cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE == "giou"
    model = build_model(cfg)
    assert model.rpn_box_reg_loss_type == "giou" and model.rpn_box_reg_loss_weight == 2.0
    assert model.box_reg_loss_type == "giou" and model.box_reg_loss_weight == 10.0
    batch = _batch(with_masks=True)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    # the reg-loss weights scale ONLY the localization terms
    half = model.clone(rpn_box_reg_loss_weight=1.0, box_reg_loss_weight=1.0)
    lh = half.apply(params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(losses["loss_rpn_loc"]), 2.0 * float(lh["loss_rpn_loc"]), rtol=1e-5)
    np.testing.assert_allclose(float(losses["loss_box_reg"]), 10.0 * float(lh["loss_box_reg"]), rtol=1e-5)
    np.testing.assert_allclose(float(losses["loss_rpn_cls"]), float(lh["loss_rpn_cls"]), rtol=1e-6)
    # giou loc loss differs from the smooth-l1 one on the same params
    sl1 = model.clone(rpn_box_reg_loss_type="smooth_l1", box_reg_loss_type="smooth_l1")
    ls = sl1.apply(params, batch, jax.random.PRNGKey(1))
    assert abs(float(ls["loss_rpn_loc"]) - float(losses["loss_rpn_loc"])) > 1e-6
