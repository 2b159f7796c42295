"""RetinaNet detector-level torch/numpy-oracle parity.

Completes the detector-parity coverage of the third meta-arch family
(after C4: test_torch_parity_detector.py and FPN: test_fpn_detector_parity
.py). The RetinaNet-specific pieces the other harnesses cannot see:

    LastLevelP6P7 learned top block fed from res5 (backbone/fpn.py)
    shared 4-conv cls/box towers over 5 levels (retinanet.py RetinaNetHead)
    per-level threshold->topk candidate selection with NO box clipping
      before NMS (retinanet.py inference_single_image:442-486)
    focal loss over valid (non-ignore) anchors + smooth-L1 on positives,
      divided by the EMA foreground-count normalizer
      (retinanet.py losses:292-345, loss_normalizer:154-155)

Weights flow through the real convert_d2_retinanet checkpoint dialect, so
this doubles as the d2-retinanet-naming census. The oracle is an
independent torch/numpy reimplementation of the reference semantics
(cites: /root/reference/detectron2/modeling/meta_arch/retinanet.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_fpn_checkpoint import _TorchBottomUp, K  # noqa: E402
from test_torch_parity import _randomize_bn  # noqa: E402
from test_torch_parity_detector import (  # noqa: E402
    np_apply_deltas,
    np_batched_nms,
    np_get_deltas,
    np_matcher,
    np_pairwise_iou,
)

from cddmsl_tpu.checkpoint.convert_torch import (  # noqa: E402
    _merge,
    convert_d2_retinanet,
    detect_dialect,
)
from cddmsl_tpu.models import DetBatch  # noqa: E402
from cddmsl_tpu.models.retinanet import RetinaNet  # noqa: E402

FPN_CH = 64
HEAD_CH = 32
H, W = 64, 96
STRIDES = (8, 16, 32, 64, 128)
ANCHOR_SIZES = ((8, 10), (16, 20), (32, 40), (64, 80), (128, 161))
ASPECTS = (0.5, 1.0, 2.0)
A = len(ANCHOR_SIZES[0]) * len(ASPECTS)
SCORE_THRESH = 0.05
NMS_THRESH = 0.5
TOPK = 32
DETS_PER_IMG = 12
IOU_THRESHOLDS = (0.4, 0.5)
FOCAL_ALPHA, FOCAL_GAMMA = 0.25, 2.0


# ---------------- torch modules with d2 checkpoint naming ----------------
class _TorchTopBlock(nn.Module):
    """reference backbone/fpn.py LastLevelP6P7 (in_feature='res5')."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.p6 = nn.Conv2d(in_ch, out_ch, 3, stride=2, padding=1)
        self.p7 = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)

    def forward(self, c5):
        p6 = self.p6(c5)
        return p6, self.p7(F.relu(p6))


class _TorchRetinaFPN(nn.Module):
    """d2 FPN over res3-5 + LastLevelP6P7 (build_retinanet_resnet_fpn_backbone)."""

    def __init__(self):
        super().__init__()
        for lvl, ch in zip((3, 4, 5), (64, 128, 256)):
            setattr(self, f"fpn_lateral{lvl}", nn.Conv2d(ch, FPN_CH, 1))
            setattr(self, f"fpn_output{lvl}", nn.Conv2d(FPN_CH, FPN_CH, 3, padding=1))
        self.top_block = _TorchTopBlock(256, FPN_CH)

    def forward(self, feats):
        laterals = {
            lvl: getattr(self, f"fpn_lateral{lvl}")(feats[f"res{lvl}"]) for lvl in (3, 4, 5)
        }
        prev = laterals[5]
        out = {5: self.fpn_output5(prev)}
        for lvl in (4, 3):
            prev = laterals[lvl] + F.interpolate(prev, scale_factor=2, mode="nearest")
            out[lvl] = getattr(self, f"fpn_output{lvl}")(prev)
        p6, p7 = self.top_block(feats["res5"])
        return [out[3], out[4], out[5], p6, p7]


class _TorchRetinaHead(nn.Module):
    """reference retinanet.py RetinaNetHead: Sequential(conv, relu)*2 towers."""

    def __init__(self):
        super().__init__()
        def tower():
            return nn.Sequential(
                nn.Conv2d(FPN_CH, HEAD_CH, 3, padding=1), nn.ReLU(),
                nn.Conv2d(HEAD_CH, HEAD_CH, 3, padding=1), nn.ReLU(),
            )
        self.cls_subnet = tower()
        self.bbox_subnet = tower()
        self.cls_score = nn.Conv2d(HEAD_CH, A * K, 3, padding=1)
        self.bbox_pred = nn.Conv2d(HEAD_CH, A * 4, 3, padding=1)

    def forward(self, levels):
        logits = [self.cls_score(self.cls_subnet(f)) for f in levels]
        deltas = [self.bbox_pred(self.bbox_subnet(f)) for f in levels]
        return logits, deltas


def np_level_anchors():
    """d2 DefaultAnchorGenerator grids per level (anchor-fastest order)."""
    out = []
    for (h, w), stride, sizes in zip(
        [(H // s + (H % s > 0), W // s + (W % s > 0)) for s in STRIDES], STRIDES, ANCHOR_SIZES
    ):
        cells = []
        for size in sizes:
            area = size ** 2.0
            for ar in ASPECTS:
                cw = np.sqrt(area / ar)
                ch = ar * cw
                cells.append([-cw / 2, -ch / 2, cw / 2, ch / 2])
        cells = np.asarray(cells, np.float32)
        sx, sy = np.meshgrid(np.arange(w) * stride, np.arange(h) * stride)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], 1)
        out.append((shifts[:, None, :] + cells[None, :, :]).reshape(-1, 4).astype(np.float32))
    return out


def _flat_nhwa(x_nchw, last):
    """torch (N, A*last, H, W) -> (N, H*W*A, last) — d2 permute_to_N_HWA_K."""
    n, _, h, w = x_nchw.shape
    x = x_nchw.reshape(n, -1, last, h, w).permute(0, 3, 4, 1, 2)
    return x.reshape(n, -1, last)


class _Oracle:
    """Reference-faithful RetinaNet pipeline on the torch modules."""

    def __init__(self, mods):
        self.m = mods
        self.anchors = np_level_anchors()

    def raw(self, x_nchw):
        with torch.no_grad():
            levels = self.m["fpn"](self.m["bottom_up"](torch.from_numpy(x_nchw)))
            logits, deltas = self.m["head"](levels)
        return (
            [_flat_nhwa(l, K).numpy() for l in logits],
            [_flat_nhwa(d, 4).numpy() for d in deltas],
        )

    def inference_single_image(self, logits_l, deltas_l, image_hw):
        """retinanet.py:420-486 + detector_postprocess clip."""
        boxes_all, scores_all, cls_all = [], [], []
        for logit, delta, anchors in zip(logits_l, deltas_l, self.anchors):
            prob = 1.0 / (1.0 + np.exp(-logit.reshape(-1).astype(np.float64)))
            keep = np.nonzero(prob > SCORE_THRESH)[0]
            order = np.argsort(-prob[keep], kind="stable")[: TOPK]
            top = keep[order]
            a_idx = top // K
            boxes_all.append(np_apply_deltas(delta[a_idx], anchors[a_idx], (1, 1, 1, 1)))
            scores_all.append(prob[top].astype(np.float32))
            cls_all.append((top % K).astype(np.int64))
        boxes = np.concatenate(boxes_all)
        scores = np.concatenate(scores_all)
        classes = np.concatenate(cls_all)
        keep = np_batched_nms(boxes, scores, classes, NMS_THRESH)[: DETS_PER_IMG]
        out_boxes = boxes[keep].copy()
        out_boxes[:, 0::2] = out_boxes[:, 0::2].clip(0, image_hw[1])
        out_boxes[:, 1::2] = out_boxes[:, 1::2].clip(0, image_hw[0])
        return out_boxes, scores[keep], classes[keep]

    def losses(self, logits_l, deltas_l, gt_boxes, gt_classes, norm_prev=100.0):
        """retinanet.py losses:292-345 + label_anchors:348-390."""
        anchors = np.concatenate(self.anchors)
        n_img = len(gt_boxes)
        cls_total, reg_total, nfg_total = 0.0, 0.0, 0
        for i in range(n_img):
            logit = np.concatenate([l[i] for l in logits_l]).astype(np.float64)
            delta = np.concatenate([d[i] for d in deltas_l]).astype(np.float64)
            iou = np_pairwise_iou(gt_boxes[i], anchors)
            matches, labels = np_matcher(iou, list(IOU_THRESHOLDS), [0, -1, 1], True)
            valid = labels != -1
            fg = labels == 1
            nfg_total += int(fg.sum())
            gt_cls = np.where(fg, gt_classes[i][matches], K)
            onehot = np.eye(K + 1)[gt_cls][:, :-1]  # bg row -> zeros
            p = 1.0 / (1.0 + np.exp(-logit))
            ce = np.maximum(logit, 0) - logit * onehot + np.log1p(np.exp(-np.abs(logit)))
            p_t = p * onehot + (1 - p) * (1 - onehot)
            alpha_t = FOCAL_ALPHA * onehot + (1 - FOCAL_ALPHA) * (1 - onehot)
            cls_total += (alpha_t * (1 - p_t) ** FOCAL_GAMMA * ce)[valid].sum()
            if fg.any():
                gt_deltas = np_get_deltas(anchors[fg], gt_boxes[i][matches[fg]], (1, 1, 1, 1))
                reg_total += np.abs(delta[fg] - gt_deltas).sum()  # beta=0 -> L1
        norm = 0.9 * norm_prev + 0.1 * max(nfg_total, 1)
        return cls_total / norm, reg_total / norm, norm


def _jax_model():
    return RetinaNet(
        num_classes=K, depth=10, backbone_width=8, res2_out_channels=32,
        fpn_out_channels=FPN_CH, head_conv_dims=(HEAD_CH, HEAD_CH),
        anchor_sizes=ANCHOR_SIZES, aspect_ratios=ASPECTS,
        smooth_l1_beta=0.0, score_thresh=SCORE_THRESH, nms_thresh=NMS_THRESH,
        topk_candidates=TOPK, detections_per_image=DETS_PER_IMG,
        pixel_mean=(0.0, 0.0, 0.0), pixel_std=(1.0, 1.0, 1.0),
    )


@pytest.fixture(scope="module")
def oracle_and_params():
    rng = np.random.RandomState(11)
    torch.manual_seed(11)
    mods = {
        "bottom_up": _TorchBottomUp(),
        "fpn": _TorchRetinaFPN(),
        "head": _TorchRetinaHead(),
    }
    _randomize_bn(mods["bottom_up"], rng)
    for m in mods.values():
        m.eval()
    sd = {}
    for k, v in mods["bottom_up"].state_dict().items():
        sd[f"backbone.bottom_up.{k}"] = v.numpy()
    for k, v in mods["fpn"].state_dict().items():
        sd[f"backbone.{k}"] = v.numpy()
    for k, v in mods["head"].state_dict().items():
        sd[f"head.{k}"] = v.numpy()
    assert detect_dialect(sd) == "d2_retinanet"

    model = _jax_model()
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, method=model.inference)
    tree = jax.tree_util.tree_map(np.asarray, variables["params"])
    converted = convert_d2_retinanet(sd)
    _merge(tree, converted)
    variables = {"params": tree, "batch_stats": dict(variables["batch_stats"])}

    # census: every checkpoint key must have been consumed by the converter
    def _leaves(t, pre=()):
        for k, v in t.items():
            if isinstance(v, dict):
                yield from _leaves(v, pre + (k,))
            else:
                yield pre + (k,)
    n_converted = len(list(_leaves(converted)))
    # num_batches_tracked BN buffers are dropped by the reference loader too
    n_real = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_converted == n_real, (n_converted, n_real)
    return _Oracle(mods), model, variables


def _batch():
    rng = np.random.RandomState(7)
    imgs = (rng.rand(2, H, W, 3) * 255.0).astype(np.float32)
    gt_boxes = np.zeros((2, 4, 4), np.float32)
    gt_classes = np.zeros((2, 4), np.int32)
    gt_valid = np.zeros((2, 4), bool)
    gt_boxes[0, :3] = [[10, 8, 40, 30], [50, 20, 90, 60], [4, 40, 30, 62]]
    gt_classes[0, :3] = [1, 3, 0]
    gt_valid[0, :3] = True
    gt_boxes[1, :2] = [[20, 10, 70, 50], [5, 5, 25, 25]]
    gt_classes[1, :2] = [2, 1]
    gt_valid[1, :2] = True
    sizes = np.asarray([[H, W], [H, W]], np.int32)
    return DetBatch(
        image=jnp.asarray(imgs), image_sizes=jnp.asarray(sizes),
        orig_sizes=jnp.asarray(sizes), gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.asarray(gt_classes), gt_valid=jnp.asarray(gt_valid),
    )


def _np_images(batch):
    return np.asarray(batch.image).transpose(0, 3, 1, 2).copy()


def test_feature_and_head_parity(oracle_and_params):
    """p3..p7 + raw head outputs match after checkpoint conversion."""
    oracle, model, variables = oracle_and_params
    batch = _batch()
    logits_t, deltas_t = oracle.raw(_np_images(batch))

    def raw_jax(mdl, b):
        levels = mdl._features(b.image)
        return mdl.head(levels)

    logits_j, deltas_j = model.apply(variables, batch, method=raw_jax)
    for lt, lj in zip(logits_t, logits_j):
        got = np.asarray(lj).reshape(lt.shape)
        np.testing.assert_allclose(got, lt, atol=2e-4, rtol=1e-3)
    for dt, dj in zip(deltas_t, deltas_j):
        got = np.asarray(dj).reshape(dt.shape)
        np.testing.assert_allclose(got, dt, atol=2e-4, rtol=1e-3)


def test_inference_parity(oracle_and_params):
    """Same post-NMS kept set, classes, scores and boxes per image."""
    oracle, model, variables = oracle_and_params
    batch = _batch()
    det = model.apply(variables, batch, method=model.inference)
    logits_t, deltas_t = oracle.raw(_np_images(batch))
    for i in range(2):
        want_b, want_s, want_c = oracle.inference_single_image(
            [l[i] for l in logits_t], [d[i] for d in deltas_t], (H, W)
        )
        valid = np.asarray(det.valid[i])
        got_b = np.asarray(det.boxes[i])[valid]
        got_s = np.asarray(det.scores[i])[valid]
        got_c = np.asarray(det.classes[i])[valid]
        assert len(got_s) == len(want_s), (len(got_s), len(want_s))
        # both sides emit in score-desc order
        np.testing.assert_array_equal(got_c, want_c)
        np.testing.assert_allclose(got_s, want_s, atol=1e-4)
        np.testing.assert_allclose(got_b, want_b, atol=1e-2)


def test_loss_parity(oracle_and_params):
    """Focal + L1 sums over the matched anchors, EMA-normalized, match."""
    oracle, model, variables = oracle_and_params
    batch = _batch()
    losses, mutated = model.apply(
        variables, batch, jax.random.PRNGKey(0), mutable=["batch_stats"]
    )
    logits_t, deltas_t = oracle.raw(_np_images(batch))
    gt_boxes = [np.asarray(batch.gt_boxes[i])[np.asarray(batch.gt_valid[i])] for i in range(2)]
    gt_classes = [
        np.asarray(batch.gt_classes[i])[np.asarray(batch.gt_valid[i])] for i in range(2)
    ]
    want_cls, want_reg, want_norm = oracle.losses(logits_t, deltas_t, gt_boxes, gt_classes)
    np.testing.assert_allclose(float(losses["loss_cls"]), want_cls, rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss_box_reg"]), want_reg, rtol=1e-4)
    # the EMA normalizer advanced exactly as the reference's (init 100)
    np.testing.assert_allclose(
        float(mutated["batch_stats"]["loss_normalizer"]), want_norm, rtol=1e-6
    )
    # second step: EMA rolls forward from the mutated state
    variables2 = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    losses2, mutated2 = model.apply(
        variables2, batch, jax.random.PRNGKey(0), mutable=["batch_stats"]
    )
    want_cls2, want_reg2, want_norm2 = oracle.losses(
        logits_t, deltas_t, gt_boxes, gt_classes, norm_prev=want_norm
    )
    np.testing.assert_allclose(float(losses2["loss_cls"]), want_cls2, rtol=1e-4)
    np.testing.assert_allclose(
        float(mutated2["batch_stats"]["loss_normalizer"]), want_norm2, rtol=1e-6
    )
