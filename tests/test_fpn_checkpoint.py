"""d2-FPN checkpoint dialect (checkpoint/convert_torch.py convert_d2_fpn_rcnn).

The reference loads Base-RCNN-FPN zoo checkpoints ('backbone.bottom_up.*' +
'backbone.fpn_lateral/output*' + RPN head + ConvFC box head + mask head)
through its c2/d2 heuristics (checkpoint/c2_model_loading.py); here the
d2_fpn dialect maps them onto FPNRCNN. The oracle modules below are built
from plain torch.nn with d2 checkpoint naming, so agreement validates the
layout conversions (OIHW->HWIO, the NCHW-flatten fc1 reorder, the
ConvTranspose kernel flip), not shared code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as fnn  # noqa: E402

from test_torch_parity import _TorchD2Bottleneck, _randomize_bn  # noqa: E402

from cddmsl_tpu.checkpoint.convert_torch import (  # noqa: E402
    _deconv,
    _dense_from_chw_flat,
    convert_d2_fpn_rcnn,
    detect_dialect,
)

K = 4  # classes
FPN_CH = 64


class _TorchBottomUp(nn.Module):
    """depth-10-style tiny d2 ResNet with checkpoint naming."""

    def __init__(self):
        super().__init__()

        class Stem(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
                self.conv1.norm = nn.BatchNorm2d(64)

            def forward(self, x):
                x = F.relu(self.conv1.norm(self.conv1(x)))
                return F.max_pool2d(x, 3, stride=2, padding=1)

        self.stem = Stem()
        self.res2 = nn.Sequential(_TorchD2Bottleneck(64, 8, 32, 1))
        self.res3 = nn.Sequential(_TorchD2Bottleneck(32, 16, 64, 2))
        self.res4 = nn.Sequential(_TorchD2Bottleneck(64, 32, 128, 2))
        self.res5 = nn.Sequential(_TorchD2Bottleneck(128, 64, 256, 2))

    def forward(self, x):
        x = self.stem(x)
        c2 = self.res2(x)
        c3 = self.res3(c2)
        c4 = self.res4(c3)
        c5 = self.res5(c4)
        return {"res2": c2, "res3": c3, "res4": c4, "res5": c5}


class _TorchFPN(nn.Module):
    """d2 FPN semantics (backbone/fpn.py): 1x1 laterals, top-down nearest
    upsample + sum, 3x3 output convs, p6 = maxpool(k1, s2) on p5."""

    def __init__(self):
        super().__init__()
        for lvl, ch in zip((2, 3, 4, 5), (32, 64, 128, 256)):
            setattr(self, f"fpn_lateral{lvl}", nn.Conv2d(ch, FPN_CH, 1))
            setattr(self, f"fpn_output{lvl}", nn.Conv2d(FPN_CH, FPN_CH, 3, padding=1))

    def forward(self, feats):
        laterals = {
            lvl: getattr(self, f"fpn_lateral{lvl}")(feats[f"res{lvl}"]) for lvl in (2, 3, 4, 5)
        }
        prev = laterals[5]
        out = {5: self.fpn_output5(prev)}
        for lvl in (4, 3, 2):
            prev = laterals[lvl] + F.interpolate(prev, scale_factor=2, mode="nearest")
            out[lvl] = getattr(self, f"fpn_output{lvl}")(prev)
        out[6] = F.max_pool2d(out[5], 1, stride=2)
        return [out[lvl] for lvl in (2, 3, 4, 5, 6)]


def _tiny_fpn_rcnn(mask_on=True, **overrides):
    from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

    kwargs = dict(
        num_classes=K,
        depth=10,
        backbone_width=8,
        res2_out_channels=32,
        fpn_out_channels=FPN_CH,
        fc_dim=64,
        emb_dim=64,
        use_text_emb=False,
        mask_on=mask_on,
        mask_num_conv=2,
        mask_conv_dim=32,
        rpn_pre_nms_topk=(64, 32),
        rpn_post_nms_topk=(32, 16),
        roi_batch_size_per_image=16,
        detections_per_image=8,
        pixel_mean=(0.0, 0.0, 0.0),
        pixel_std=(1.0, 1.0, 1.0),
    )
    kwargs.update(overrides)
    return FPNRCNN(**kwargs)


def _full_torch_sd(rng):
    """Every key a d2 FPN Mask R-CNN checkpoint carries (tiny shapes)."""
    torch.manual_seed(5)
    bottom_up = _TorchBottomUp()
    _randomize_bn(bottom_up, rng)
    fpn = _TorchFPN()
    rpn_conv = nn.Conv2d(FPN_CH, FPN_CH, 3, padding=1)
    rpn_logits = nn.Conv2d(FPN_CH, 3, 1)
    rpn_deltas = nn.Conv2d(FPN_CH, 12, 1)
    fc1 = nn.Linear(FPN_CH * 7 * 7, 64)
    fc2 = nn.Linear(64, 64)
    cls_score = nn.Linear(64, K + 1)
    bbox_pred = nn.Linear(64, K * 4)
    mask_fcn1 = nn.Conv2d(FPN_CH, 32, 3, padding=1)
    mask_fcn2 = nn.Conv2d(32, 32, 3, padding=1)
    deconv = nn.ConvTranspose2d(32, 32, 2, stride=2)
    predictor = nn.Conv2d(32, K, 1)

    sd = {}
    for k, v in bottom_up.state_dict().items():
        sd[f"backbone.bottom_up.{k}"] = v.numpy()
    for k, v in fpn.state_dict().items():
        sd[f"backbone.{k}"] = v.numpy()
    for name, mod in (("conv", rpn_conv), ("objectness_logits", rpn_logits),
                      ("anchor_deltas", rpn_deltas)):
        for p, v in mod.state_dict().items():
            sd[f"proposal_generator.rpn_head.{name}.{p}"] = v.numpy()
    for name, mod in (("box_head.fc1", fc1), ("box_head.fc2", fc2),
                      ("box_predictor.cls_score", cls_score),
                      ("box_predictor.bbox_pred", bbox_pred),
                      ("mask_head.mask_fcn1", mask_fcn1), ("mask_head.mask_fcn2", mask_fcn2),
                      ("mask_head.deconv", deconv), ("mask_head.predictor", predictor)):
        for p, v in mod.state_dict().items():
            sd[f"roi_heads.{name}.{p}"] = v.numpy()
    mods = dict(bottom_up=bottom_up, fpn=fpn, rpn_conv=rpn_conv, fc1=fc1, fc2=fc2,
                cls_score=cls_score, bbox_pred=bbox_pred, mask_fcn1=mask_fcn1,
                mask_fcn2=mask_fcn2, deconv=deconv, predictor=predictor)
    return sd, mods


def test_deconv_layout_parity():
    """torch ConvTranspose2d(2, s2) == flax nn.ConvTranspose with the
    converted kernel (the exact config of the mask head deconv)."""
    torch.manual_seed(0)
    td = nn.ConvTranspose2d(6, 5, 2, stride=2)
    x = np.random.RandomState(0).randn(2, 6, 7, 9).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x)).numpy()

    m = fnn.ConvTranspose(5, (2, 2), strides=(2, 2))
    params = {"params": {"kernel": jnp.asarray(_deconv(td.weight.detach().numpy())),
                         "bias": jnp.asarray(td.bias.detach().numpy())}}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_fc1_chw_flat_parity():
    """torch fc1 on an NCHW flatten == flax Dense (converted kernel) on the
    NHWC flatten this repo's pooler produces."""
    torch.manual_seed(1)
    fc = nn.Linear(6 * 7 * 7, 13)
    x = np.random.RandomState(1).randn(4, 6, 7, 7).astype(np.float32)
    with torch.no_grad():
        want = fc(torch.from_numpy(x).flatten(1)).numpy()
    k = _dense_from_chw_flat(fc.weight.detach().numpy(), 6, 7, 7)
    got = x.transpose(0, 2, 3, 1).reshape(4, -1) @ k + fc.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fpn_feature_parity(rng):
    """backbone+FPN levels p2..p6 match the torch oracle after conversion."""
    sd, mods = _full_torch_sd(rng)
    mods["bottom_up"].eval()
    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want_levels = mods["fpn"](mods["bottom_up"](torch.from_numpy(x)))

    model = _tiny_fpn_rcnn()
    # pixel_mean sums < 3 -> the model treats inputs as 0..255 and divides by
    # 255 (CLIP-stats convention); the torch oracle sees the raw 0..1 tensor
    batch_img = jnp.asarray(x.transpose(0, 2, 3, 1)) * 255.0
    variables = model.init(jax.random.PRNGKey(0), batch_img, method=model._features)
    tree = jax.tree_util.tree_map(np.asarray, variables["params"])
    from cddmsl_tpu.checkpoint.convert_torch import _merge

    _merge(tree, convert_d2_fpn_rcnn(sd))
    _, rpn_levels = model.apply({"params": tree}, batch_img, method=model._features)
    assert len(rpn_levels) == 5
    for got, want in zip(rpn_levels, want_levels):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(), atol=3e-4, rtol=1e-3
        )


def test_full_fpn_checkpoint_load(tmp_path, rng):
    """Every checkpoint key maps onto the FPNRCNN tree with the right shape
    and value; dialect auto-detected; inference runs on the loaded params."""
    from cddmsl_tpu.checkpoint.convert_torch import load_rcnn_weights
    from cddmsl_tpu.models import DetBatch

    sd, mods = _full_torch_sd(rng)
    assert detect_dialect(sd) == "d2_fpn"
    path = str(tmp_path / "fpn.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    model = _tiny_fpn_rcnn()
    h, w = 64, 96
    batch = DetBatch(
        image=jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) * 255),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        orig_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.zeros((1, 4, 4), jnp.float32),
        gt_classes=jnp.zeros((1, 4), jnp.int32),
        gt_valid=jnp.zeros((1, 4), bool),
    )
    params = model.init(jax.random.PRNGKey(0), batch, method=model.inference)
    loaded = load_rcnn_weights(params, path)

    t = loaded["params"]
    # spot-check each family's value mapping (OIHW->HWIO etc.)
    np.testing.assert_allclose(
        t["fpn"]["lateral_res3"]["kernel"],
        sd["backbone.fpn_lateral3.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        t["proposal_generator"]["head"]["conv"]["kernel"],
        sd["proposal_generator.rpn_head.conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        t["roi_heads"]["box_head_fc2"]["kernel"],
        sd["roi_heads.box_head.fc2.weight"].T,
    )
    np.testing.assert_allclose(
        t["roi_heads"]["box_predictor"]["cls_score"]["kernel"],
        sd["roi_heads.box_predictor.cls_score.weight"].T,
    )
    np.testing.assert_allclose(
        t["roi_heads"]["box_predictor"]["cls_score"]["bias"],
        sd["roi_heads.box_predictor.cls_score.bias"],
    )
    np.testing.assert_allclose(
        t["roi_heads"]["mask_head"]["mask_fcn2"]["kernel"],
        sd["roi_heads.mask_head.mask_fcn2.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        t["backbone"]["res3_0"]["conv2"]["kernel"],
        sd["backbone.bottom_up.res3.0.conv2.weight"].transpose(2, 3, 1, 0),
    )
    # fc1 got the NCHW->NHWC reorder, NOT a plain transpose
    plain = sd["roi_heads.box_head.fc1.weight"].T
    reordered = t["roi_heads"]["box_head_fc1"]["kernel"]
    assert reordered.shape == plain.shape and not np.allclose(reordered, plain)

    # inference executes on the loaded tree
    det = model.apply(loaded, batch, method=model.inference)
    assert np.isfinite(np.asarray(det.scores)).all()

    # census: every roi_heads./backbone./proposal_generator. checkpoint key
    # must have been consumed by the converter (nothing silently dropped)
    converted = convert_d2_fpn_rcnn(sd)

    def _leaves(d, pre=()):
        for kk, vv in d.items():
            if isinstance(vv, dict):
                yield from _leaves(vv, pre + (kk,))
            else:
                yield pre + (kk,)

    n_leaves = len(list(_leaves(converted)))
    # num_batches_tracked buffers are the only reference keys without params
    n_expected = len([k for k in sd if "num_batches_tracked" not in k])
    assert n_leaves == n_expected, (n_leaves, n_expected)
