"""d2-ResNet breadth features: ResNeXt grouped convs (RESNETS.NUM_GROUPS),
norm choice (RESNETS.NORM=GN), and deformable-conv stages
(RESNETS.DEFORM_ON_PER_STAGE) — reference detectron2/modeling/backbone/
resnet.py BottleneckBlock/DeformBottleneckBlock + layers/batch_norm.py
get_norm, exercised by the X101/dconv/GN zoo configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cddmsl_tpu.models.backbone.batch_norm import GroupNorm32
from cddmsl_tpu.models.backbone.resnet import D2Bottleneck, D2ResNet


def _identity_bn(params):
    """Make every FrozenBN in the (possibly nested) param dict an identity."""
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            if "running_mean" in v:
                out[k] = {
                    "weight": jnp.ones_like(v["weight"]),
                    "bias": jnp.zeros_like(v["bias"]),
                    "running_mean": jnp.zeros_like(v["running_mean"]),
                    "running_var": jnp.ones_like(v["running_var"]),
                }
            else:
                out[k] = _identity_bn(v)
        else:
            out[k] = v
    return out


def test_grouped_bottleneck_matches_torch():
    """D2Bottleneck(num_groups=4) == the same block written with
    torch.nn.Conv2d(groups=4) — the ResNeXt 3x3."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    block = D2Bottleneck(bottleneck_channels=16, out_channels=32, stride=1, num_groups=4)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = _identity_bn(params)
    assert params["conv2"]["kernel"].shape == (3, 3, 4, 16)  # in/groups
    # this CPU's default matmul precision is reduced; parity needs 'highest'
    with jax.default_matmul_precision("highest"):
        out = block.apply({"params": params}, jnp.asarray(x))

    def t(k):  # HWIO -> OIHW
        return torch.from_numpy(np.asarray(k).transpose(3, 2, 0, 1))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    h = torch.relu(torch.nn.functional.conv2d(xt, t(params["conv1"]["kernel"])))
    h = torch.relu(torch.nn.functional.conv2d(h, t(params["conv2"]["kernel"]), padding=1, groups=4))
    h = torch.nn.functional.conv2d(h, t(params["conv3"]["kernel"]))
    sc = torch.nn.functional.conv2d(xt, t(params["shortcut"]["kernel"]))
    ref = torch.relu(h + sc).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_deform_block_equals_regular_at_init():
    """DeformBottleneckBlock's offset conv is zero-init, so at init the
    deform block IS the regular block with the same 3x3 kernel (v1), and
    the v2 (modulated) block is the same with the conv2 path halved
    (sigmoid(0)=0.5 mask)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 10, 8).astype(np.float32))
    reg = D2Bottleneck(bottleneck_channels=8, out_channels=16, stride=2, stride_in_1x1=False)
    dfm = D2Bottleneck(bottleneck_channels=8, out_channels=16, stride=2, stride_in_1x1=False,
                       deform=True)
    p_d = _identity_bn(dfm.init(jax.random.PRNGKey(2), x)["params"])
    # transplant the deform kernel into the regular block's conv2
    p_r = _identity_bn(reg.init(jax.random.PRNGKey(3), x)["params"])
    p_r["conv2"] = {"kernel": p_d["conv2_kernel"]}
    for site in ("conv1", "conv3", "shortcut"):
        p_r[site] = p_d[site]
    with jax.default_matmul_precision("highest"):
        out_r = reg.apply({"params": p_r}, x)
        out_d = dfm.apply({"params": p_d}, x)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_r), atol=1e-4)

    mod = D2Bottleneck(bottleneck_channels=8, out_channels=16, stride=2, stride_in_1x1=False,
                       deform=True, deform_modulated=True)
    p_m = dict(p_d)
    p_m["conv2_offset"] = mod.init(jax.random.PRNGKey(4), x)["params"]["conv2_offset"]
    with jax.default_matmul_precision("highest"):
        out_m = mod.apply({"params": p_m}, x)
    # mask=0.5 halves conv2's output; verify against a halved-kernel regular block
    p_half = dict(p_r)
    p_half["conv2"] = {"kernel": p_d["conv2_kernel"] * 0.5}
    with jax.default_matmul_precision("highest"):
        out_half = reg.apply({"params": p_half}, x)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_half), atol=1e-4)


def test_deform_grads_flow():
    x = jnp.asarray(np.random.RandomState(5).randn(1, 8, 8, 8).astype(np.float32))
    blk = D2Bottleneck(bottleneck_channels=8, out_channels=16, deform=True, deform_modulated=True)
    params = blk.init(jax.random.PRNGKey(6), x)["params"]
    g = jax.grad(lambda p: jnp.sum(blk.apply({"params": p}, x) ** 2))(params)
    # offset conv gets gradient even though it is zero-init (bilinear taps)
    assert np.isfinite(np.asarray(g["conv2_offset"]["kernel"])).all()
    assert np.abs(np.asarray(g["conv2_kernel"])).max() > 0


def test_groupnorm32_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 5, 7, 64).astype(np.float32)
    w = rng.randn(64).astype(np.float32)
    b = rng.randn(64).astype(np.float32)
    m = GroupNorm32(features=64)
    out = m.apply({"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2), 32,
        torch.from_numpy(w), torch.from_numpy(b), 1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("norm", ["FrozenBN", "GN"])
def test_resnext_backbone_forward(norm):
    """Tiny X101-style tower: grouped bottlenecks, C2 stride placement."""
    net = D2ResNet(depth=10, out_features=("res2", "res5"), num_groups=4,
                   width_per_group=4, stride_in_1x1=False, norm=norm,
                   stem_out_channels=8, res2_out_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, jnp.asarray(np.random.RandomState(8).randn(1, 64, 64, 3), jnp.float32))
    assert out["res2"].shape == (1, 16, 16, 16)
    assert out["res5"].shape == (1, 2, 2, 128)
    assert np.isfinite(np.asarray(out["res5"])).all()


def test_dc5_dilated_res5():
    """RES5_DILATION=2 keeps res5 at stride 16 (the DC5 family)."""
    net = D2ResNet(depth=10, out_features=("res5",), res5_dilation=2,
                   stem_out_channels=8, res2_out_channels=16, width_per_group=4)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out["res5"].shape[1:3] == (4, 4)  # 64/16, not 64/32
    assert net.out_feature_strides["res5"] == 16


def test_deform_stage_in_backbone():
    net = D2ResNet(depth=10, out_features=("res4",),
                   deform_on_per_stage=(False, False, True, False),
                   stem_out_channels=8, res2_out_channels=16, width_per_group=4)
    x = jnp.asarray(np.random.RandomState(9).randn(1, 32, 32, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)
    assert "conv2_offset" in params["params"]["res4_0"]
    assert "conv2_offset" not in params["params"]["res3_0"]
    out = net.apply(params, x)
    assert np.isfinite(np.asarray(out["res4"])).all()


def test_convert_d2_resnet_deform_naming():
    """d2 DCN checkpoints store the deformable 3x3 as conv2.weight +
    conv2_offset.{weight,bias}; the converter must land them on our
    conv2_kernel raw param + conv2_offset module (clip_model_loading-style
    rename surface)."""
    from cddmsl_tpu.checkpoint.convert_torch import convert_d2_resnet

    sd = {
        "backbone.res4.0.conv2.weight": np.zeros((8, 8, 3, 3), np.float32),
        "backbone.res4.0.conv2_offset.weight": np.zeros((27, 8, 3, 3), np.float32),
        "backbone.res4.0.conv2_offset.bias": np.zeros((27,), np.float32),
        "backbone.res3.0.conv2.weight": np.zeros((8, 8, 3, 3), np.float32),
    }
    tree = convert_d2_resnet(sd)
    assert tree["res4_0"]["conv2_kernel"].shape == (3, 3, 8, 8)
    assert tree["res4_0"]["conv2_offset"]["kernel"].shape == (3, 3, 8, 27)
    assert tree["res4_0"]["conv2_offset"]["bias"].shape == (27,)
    assert "conv2" not in tree["res4_0"]
    # non-deform block keeps the module path
    assert tree["res3_0"]["conv2"]["kernel"].shape == (3, 3, 8, 8)


def _zoo_cfg(rel):
    import os

    from cddmsl_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..", "configs", rel))
    return cfg


def test_zoo_breadth_configs_build():
    """The X101 / GN / dconv / cls-agnostic zoo yamls propagate their knobs
    into the built FPNRCNN (build-only: module dataclass construction)."""
    from cddmsl_tpu.models import build_model

    m = build_model(_zoo_cfg("COCO-Detection/faster_rcnn_X_101_32x8d_FPN_3x.yaml"))
    assert (m.num_groups, m.backbone_width, m.depth) == (32, 8, 101)
    assert not m.stride_in_1x1

    m = build_model(_zoo_cfg("Misc/mask_rcnn_R_50_FPN_3x_gn.yaml"))
    assert m.backbone_norm == "GN" and m.fpn_norm == "GN"
    assert (m.box_num_conv, m.box_num_fc, m.box_conv_norm) == (4, 1, "GN")
    assert m.mask_conv_norm == "GN" and m.mask_on

    m = build_model(_zoo_cfg("Misc/mask_rcnn_R_50_FPN_1x_dconv_c3-c5.yaml"))
    assert tuple(m.deform_on_per_stage) == (False, True, True, True)
    assert m.deform_modulated

    m = build_model(_zoo_cfg("Misc/mask_rcnn_R_50_FPN_1x_cls_agnostic.yaml"))
    assert m.cls_agnostic_bbox_reg and m.mask_cls_agnostic

    m = build_model(_zoo_cfg("COCO-Detection/faster_rcnn_R_101_FPN_3x.yaml"))
    assert m.depth == 101 and type(m).__name__ == "FPNRCNN"
    m = build_model(_zoo_cfg("COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x.yaml"))
    assert m.depth == 101 and m.mask_on
    m = build_model(_zoo_cfg("COCO-InstanceSegmentation/mask_rcnn_X_101_32x8d_FPN_3x.yaml"))
    assert (m.num_groups, m.backbone_width, m.depth) == (32, 8, 101) and m.mask_on
    m = build_model(_zoo_cfg("COCO-Detection/retinanet_R_101_FPN_3x.yaml"))
    assert type(m).__name__ == "RetinaNet" and m.depth == 101
    m = build_model(_zoo_cfg("COCO-Detection/rpn_R_50_C4_1x.yaml"))
    assert type(m).__name__ == "ProposalNetwork"


def test_zoo_gn_config_one_loss_step():
    """Misc/mask_rcnn_R_50_FPN_3x_gn.yaml (compile-light overrides) runs one
    train loss step with finite losses and builds GN params end-to-end."""
    import os

    import jax

    from cddmsl_tpu.models import DetBatch, build_model

    cfg = _zoo_cfg("Misc/mask_rcnn_R_50_FPN_3x_gn.yaml")
    cfg.MODEL.RESNETS.DEPTH = 10
    cfg.MODEL.RESNETS.NUM_GROUPS = 2
    cfg.TPU.BACKBONE_WIDTH = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    batch = DetBatch(
        image=jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[64, 64]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 64]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 30, 30], [40, 40, 60, 60]]], jnp.float32),
        gt_classes=jnp.asarray([[0, 2]], jnp.int32),
        gt_valid=jnp.asarray([[True, True]]),
        gt_masks=jnp.ones((1, 2, 16, 16), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    losses = model.apply(params, batch, jax.random.PRNGKey(2))
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert "stem_bn1" in params["params"]["backbone"]
    assert "running_mean" not in params["params"]["backbone"]["stem_bn1"]  # GN, not BN


def test_fpn_rcnn_gn_convfc_giou_e2e():
    """Tiny FPNRCNN in the Misc-GN-config shape (GN backbone/FPN/heads,
    conv4+fc1 box head analogue at conv1+fc1, giou box loss, cls-agnostic
    boxes+masks): one train step has finite losses incl. mask, and
    inference produces a DetectionResult."""
    from cddmsl_tpu.models.fpn_rcnn import FPNRCNN
    from cddmsl_tpu.models.rcnn import DetBatch

    model = FPNRCNN(
        num_classes=3, depth=10, mask_on=True, backbone_width=4,
        num_groups=2, stride_in_1x1=False, backbone_norm="GN",
        box_num_conv=1, box_conv_dim=16, box_num_fc=1, box_conv_norm="GN",
        fpn_norm="GN", mask_conv_norm="GN", mask_num_conv=1, mask_conv_dim=8,
        box_reg_loss_type="giou", cls_agnostic_bbox_reg=True,
        mask_cls_agnostic=True, fc_dim=32, fpn_out_channels=16,
        rpn_pre_nms_topk=(64, 32), rpn_post_nms_topk=(32, 32),
        roi_batch_size_per_image=16, detections_per_image=8,
    )
    rng = np.random.RandomState(11)
    batch = DetBatch(
        image=jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[64, 64]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 64]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 30, 30], [40, 40, 60, 60]]], jnp.float32),
        gt_classes=jnp.asarray([[0, 2]], jnp.int32),
        gt_valid=jnp.asarray([[True, True]]),
        gt_masks=jnp.ones((1, 2, 16, 16), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    losses = model.apply(params, batch, jax.random.PRNGKey(2))
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    # GN params exist where expected; cls-agnostic predictor has 4-d deltas
    assert "lateral_res2_gn" in params["params"]["fpn"]
    assert "box_head_conv1_gn" in params["params"]["roi_heads"]
    assert params["params"]["roi_heads"]["box_predictor"]["bbox_pred"]["kernel"].shape[-1] == 4
    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape == (1, 8, 4)
    assert det.masks is not None


def test_all_coco_zoo_yamls_build():
    """Every yaml under COCO-Detection / COCO-InstanceSegmentation builds a
    model from config (catches _BASE_ drift and bad keys across the zoo)."""
    import os

    from cddmsl_tpu.models import build_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for sub in (
        "COCO-Detection",
        "COCO-InstanceSegmentation",
        "COCO-Keypoints",
        "COCO-PanopticSegmentation",
        "LVISv1-InstanceSegmentation",
        "LVISv0.5-InstanceSegmentation",
        "Detectron1-Comparisons",
        "Misc",
    ):
        for fn in sorted(os.listdir(os.path.join(root, sub))):
            if fn.endswith(".yaml"):
                m = build_model(_zoo_cfg(f"{sub}/{fn}"))
                assert m is not None, fn


def test_ovd_zsinf_config_e2e():
    """CLIP_fast_rcnn_R_50_C4_ovd_zsinf: zero-shot CLIPFastRCNN from config
    — NO_BOX_DELTA keeps RPN boxes verbatim at inference; focal/bg-weight
    knobs propagate; a tiny instance runs inference end-to-end."""
    import jax

    from cddmsl_tpu.models import DetBatch, build_model
    from cddmsl_tpu.models.rcnn import DetBatch as _DB  # same type

    cfg = _zoo_cfg("COCO-InstanceSegmentation/CLIP_fast_rcnn_R_50_C4_ovd_zsinf.yaml")
    m = build_model(cfg)
    assert type(m).__name__ == "CLIPFastRCNN"
    assert m.no_box_delta and m.cls_agnostic_bbox_reg
    assert m.num_classes == 65 and m.offline_rpn_nms_thresh == 0.9
    assert m.focal_gamma == 0.5 and m.bg_loss_weight == 0.2

    tiny = m.clone(backbone_layers=(1, 1, 1, 1), backbone_width=16, embed_dim=512,
                   offline_depth=10, rpn_post_nms_topk=(64, 32), detections_per_image=8)
    rng = np.random.RandomState(0)
    batch = DetBatch(
        image=jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[64, 64]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 64]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 30, 30]]], jnp.float32),
        gt_classes=jnp.asarray([[0]], jnp.int32),
        gt_valid=jnp.asarray([[True]]),
    )
    params = tiny.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    losses = tiny.apply(params, batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    det = tiny.apply(params, batch, method=tiny.inference)
    assert det.boxes.shape == (1, 8, 4)
