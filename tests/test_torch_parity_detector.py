"""Detector-level torch-oracle parity (VERDICT round-2 item 1).

Tower-level logit parity (test_torch_parity.py) retires converter/attnpool
risk; this harness covers the *composed* eval pipeline the reference runs:

    RPN score decode -> find_top_rpn_proposals pre/post-NMS selection
      (reference detectron2/modeling/proposal_generator/proposal_utils.py)
    -> RoIAlign -> res5 -> attnpool -> text-emb cosine classifier
    -> fast_rcnn_inference: score-thresh -> per-class NMS -> topk
      (reference detectron2/modeling/roi_heads/fast_rcnn.py:47-227)
    -> inference assembly (reference modeling/meta_arch/rcnn.py:690)

plus a train-mode check of the composed losses (rpn cls/loc + roi focal-CE/
box-reg, reference rpn.py:366-430 and fast_rcnn.py:624-683) under
*exhaustive sampling* (quotas >= candidate counts, so the sampled SET is
deterministic and the padded-JAX and dynamic-torch losses must agree
numerically without matching RNG streams).

The oracle is an independent reference-faithful pipeline: the tiny torch
ModifiedResNet towers from test_torch_parity.py for the weights/conv math,
plus numpy re-implementations of d2 anchor generation, Box2BoxTransform,
find_top_rpn_proposals, torchvision greedy NMS / batched_nms (offset trick,
d2 layers/nms.py:16-43), torchvision roi_align (aligned=True bilinear), and
fast_rcnn_inference. Weights flow through checkpoint/convert_torch.py's
d2_rcnn dialect exactly as a real checkpoint load would.

Known, documented deviation exercised here: our roi_align maps
sampling_ratio=0 to a STATIC 2-sample grid (ops/roi_align.py module
docstring) while torchvision's 0 is adaptive ceil(bin). The oracle therefore
runs with sampling_ratio=2 on both sides to isolate composed-pipeline
semantics.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_torch_parity import _TorchModifiedResNet, _randomize_bn  # noqa: E402
from test_ops import np_greedy_nms  # noqa: E402

from cddmsl_tpu.checkpoint.convert_torch import load_rcnn_weights  # noqa: E402
from cddmsl_tpu.models import DetBatch  # noqa: E402
from cddmsl_tpu.models.rcnn import GeneralizedRCNN  # noqa: E402

# ---------------- shared tiny-detector spec ----------------
WIDTH = 16
EMBED = 64
NUM_CLASSES = 6
ANCHOR_SIZES = (16.0, 32.0, 64.0)
ASPECTS = (0.5, 1.0, 2.0)
A = len(ANCHOR_SIZES) * len(ASPECTS)
STRIDE = 16
IMG = 128
RPN_NMS = 0.7
PRE_NMS = (256, 192)  # train, test
POST_NMS = (64, 48)
SCORE_THRESH = 0.05
BOX_NMS = 0.5
TOPK = 20
RPN_BATCH = 2048  # >= anchor count: exhaustive sampling
ROI_BATCH = 256  # >= proposals+gt: exhaustive sampling
FOCAL_GAMMA = 0.5
BG_WEIGHT = 0.2
PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)
SAMPLING_RATIO = 2
BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
SCALE_CLAMP = math.log(1000.0 / 16)


# ---------------- numpy reference ops (d2 semantics) ----------------
def np_cell_anchors():
    """reference anchor_generator.py generate_cell_anchors."""
    out = []
    for size in ANCHOR_SIZES:
        area = size ** 2
        for ar in ASPECTS:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def np_anchor_grid(h, w):
    """reference anchor_generator.py _grid_anchors (offset 0)."""
    shift_x = np.arange(w) * STRIDE
    shift_y = np.arange(h) * STRIDE
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], 1)
    cells = np_cell_anchors()
    return (shifts[:, None, :] + cells[None, :, :]).reshape(-1, 4).astype(np.float32)


def np_apply_deltas(deltas, boxes, weights=BBOX_REG_WEIGHTS):
    """reference box_regression.py apply_deltas."""
    boxes = boxes.astype(np.float64)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    dw = np.minimum(dw, SCALE_CLAMP)
    dh = np.minimum(dh, SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = np.exp(dw) * w
    ph = np.exp(dh) * h
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], 1).astype(np.float32)


def np_get_deltas(src, tgt, weights=BBOX_REG_WEIGHTS):
    src = src.astype(np.float64)
    tgt = tgt.astype(np.float64)
    sw = np.maximum(src[:, 2] - src[:, 0], 1e-4)
    sh = np.maximum(src[:, 3] - src[:, 1], 1e-4)
    scx, scy = src[:, 0] + 0.5 * sw, src[:, 1] + 0.5 * sh
    tw = np.maximum(tgt[:, 2] - tgt[:, 0], 1e-4)
    th = np.maximum(tgt[:, 3] - tgt[:, 1], 1e-4)
    tcx, tcy = tgt[:, 0] + 0.5 * tw, tgt[:, 1] + 0.5 * th
    wx, wy, ww, wh = weights
    return np.stack(
        [wx * (tcx - scx) / sw, wy * (tcy - scy) / sh, ww * np.log(tw / sw), wh * np.log(th / sh)], 1
    ).astype(np.float32)


def np_pairwise_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def np_batched_nms(boxes, scores, classes, thresh):
    """reference layers/nms.py:16-43 coordinate-offset trick."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    offsets = classes.astype(np.float32) * (boxes.max() + 1.0)
    shifted = boxes + offsets[:, None]
    return np.asarray(np_greedy_nms_sorted(shifted, scores, thresh))


def np_greedy_nms_sorted(boxes, scores, thresh):
    """Greedy NMS returning kept indices in score-descending order
    (torchvision.ops.nms return convention)."""
    keep = np_greedy_nms(boxes, scores, thresh)  # sorted by index
    keep = sorted(keep, key=lambda i: -scores[i])
    return keep


def np_roi_align(feat_chw, rois, out=14, scale=1.0 / 16, sampling=SAMPLING_RATIO):
    """torchvision roi_align aligned=True, fixed sampling grid (numpy)."""
    C, H, W = feat_chw.shape
    R = len(rois)
    result = np.zeros((R, C, out, out), np.float32)
    s_off = (np.arange(sampling) + 0.5) / sampling
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale - 0.5
        rw, rh = x2 - x1, y2 - y1
        bw, bh = rw / out, rh / out
        ys = y1 + (np.arange(out)[:, None] + s_off[None, :]) * bh  # (out, S)
        xs = x1 + (np.arange(out)[:, None] + s_off[None, :]) * bw
        yy = np.broadcast_to(ys[:, None, :, None], (out, out, sampling, sampling))
        xx = np.broadcast_to(xs[None, :, None, :], (out, out, sampling, sampling))
        ok = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
        y = np.clip(yy, 0, H - 1)
        x = np.clip(xx, 0, W - 1)
        y0 = np.floor(y).astype(np.int64)
        x0 = np.floor(x).astype(np.int64)
        y1i = np.minimum(y0 + 1, H - 1)
        x1i = np.minimum(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        v = (
            feat_chw[:, y0, x0] * (1 - ly) * (1 - lx)
            + feat_chw[:, y0, x1i] * (1 - ly) * lx
            + feat_chw[:, y1i, x0] * ly * (1 - lx)
            + feat_chw[:, y1i, x1i] * ly * lx
        )
        v = v * ok[None]
        result[r] = v.mean(axis=(3, 4))
    return result


def np_matcher(iou, thresholds, labels, allow_low_quality):
    """reference modeling/matcher.py (iou: (G, N))."""
    if iou.shape[0] == 0:
        return np.zeros(iou.shape[1], np.int64), np.full(iou.shape[1], labels[0], np.int8)
    matched_vals = iou.max(axis=0)
    matches = iou.argmax(axis=0)
    th = [-np.inf] + list(thresholds) + [np.inf]
    match_labels = np.full(matched_vals.shape, labels[0], np.int8)
    for l, low, high in zip(labels, th[:-1], th[1:]):
        match_labels[(matched_vals >= low) & (matched_vals < high)] = l
    if allow_low_quality:
        highest = iou.max(axis=1, keepdims=True)
        best = (iou == highest) & (highest > 0)
        match_labels[best.any(axis=0)] = 1
    return matches, match_labels


# ---------------- torch oracle detector ----------------
class RefDetector:
    """Reference-faithful eval+train pipeline over the torch towers.

    Defaults are the tiny spec; test_torch_parity_fullscale.py instantiates
    the real flagship (RN50 (3,4,6,3)/width 64/embed 1024 at 800x1344 —
    r3 VERDICT next-round #2)."""

    def __init__(self, seed=7, layers=(1, 1, 1, 1), width=None, embed=None, img_hw=None,
                 rpn_batch=None):
        width = WIDTH if width is None else width
        embed = EMBED if embed is None else embed
        self.num_classes = NUM_CLASSES
        self.img_hw = (IMG, IMG) if img_hw is None else tuple(img_hw)
        self.rpn_batch = RPN_BATCH if rpn_batch is None else rpn_batch
        g = np.random.RandomState(seed)
        torch.manual_seed(seed)
        self.backbone = _TorchModifiedResNet(
            layers=layers, output_dim=embed, heads=width * 32 // 64, width=width,
            input_resolution=224,
        )
        _randomize_bn(self.backbone, g)
        c4 = width * 16
        self.rpn_conv = nn.Conv2d(c4, c4, 3, padding=1)
        self.rpn_obj = nn.Conv2d(c4, A, 1)
        self.rpn_delta = nn.Conv2d(c4, A * 4, 1)
        # sane logit spread so proposals are diverse
        with torch.no_grad():
            self.rpn_obj.weight.mul_(4.0)
            self.rpn_delta.weight.mul_(0.5)
        self.text_emb = g.randn(NUM_CLASSES, embed).astype(np.float32)
        self.bbox_w = (g.randn(NUM_CLASSES * 4, embed) * 0.01).astype(np.float32)
        self.bbox_b = (g.randn(NUM_CLASSES * 4) * 0.02).astype(np.float32)
        for m in (self.backbone, self.rpn_conv, self.rpn_obj, self.rpn_delta):
            m.eval()

    def state_dict_d2(self):
        """d2-naming checkpoint consumed by convert_torch.load_rcnn_weights."""
        sd = {"backbone." + k: v.numpy() for k, v in self.backbone.state_dict().items()}
        p = "proposal_generator.rpn_head."
        sd[p + "conv.weight"] = self.rpn_conv.weight.detach().numpy()
        sd[p + "conv.bias"] = self.rpn_conv.bias.detach().numpy()
        sd[p + "objectness_logits.weight"] = self.rpn_obj.weight.detach().numpy()
        sd[p + "objectness_logits.bias"] = self.rpn_obj.bias.detach().numpy()
        sd[p + "anchor_deltas.weight"] = self.rpn_delta.weight.detach().numpy()
        sd[p + "anchor_deltas.bias"] = self.rpn_delta.bias.detach().numpy()
        sd["roi_heads.box_predictor.cls_score.weight"] = self.text_emb
        sd["roi_heads.box_predictor.bbox_pred.weight"] = self.bbox_w
        sd["roi_heads.box_predictor.bbox_pred.bias"] = self.bbox_b
        return sd

    # ---- stages ----
    def normalize(self, images_hwc):
        x = images_hwc.astype(np.float32) / 255.0
        x = (x - np.asarray(PIXEL_MEAN, np.float32)) / np.asarray(PIXEL_STD, np.float32)
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    def res4(self, x_nchw):
        with torch.no_grad():
            h = self.backbone.stem(x_nchw)
            h = self.backbone.layer1(h)
            h = self.backbone.layer2(h)
            return self.backbone.layer3(h)

    def rpn_outputs(self, res4):
        """d2 rpn.py StandardRPNHead + permute order (H, W, A)."""
        with torch.no_grad():
            t = F.relu(self.rpn_conv(res4))
            logits = self.rpn_obj(t)  # (B, A, H, W)
            deltas = self.rpn_delta(t)  # (B, A*4, H, W)
        b, _, h, w = logits.shape
        logits = logits.permute(0, 2, 3, 1).reshape(b, -1).numpy()  # (B, HWA)
        deltas = (
            deltas.view(b, A, 4, h, w).permute(0, 3, 4, 1, 2).reshape(b, -1, 4).numpy()
        )  # (B, HWA, 4)
        return logits, deltas, (h, w)

    def find_top_rpn_proposals(self, logits, deltas, anchors, training):
        """reference proposal_utils.py find_top_rpn_proposals (single level)."""
        pre = min(PRE_NMS[0] if training else PRE_NMS[1], len(anchors))
        post = POST_NMS[0] if training else POST_NMS[1]
        order = np.argsort(-logits, kind="stable")[:pre]
        scores = logits[order]
        boxes = np_apply_deltas(deltas[order], anchors[order], (1.0, 1.0, 1.0, 1.0))
        ih, iw = self.img_hw
        boxes = np.clip(boxes, [0, 0, 0, 0], [iw, ih, iw, ih]).astype(np.float32)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, scores = boxes[keep], scores[keep]
        kept = np_greedy_nms_sorted(boxes, scores, RPN_NMS)[:post]
        return boxes[kept], scores[kept]

    def region_embed(self, res4, boxes):
        pooled = np_roi_align(res4[0].numpy(), boxes)  # (R, C, 14, 14)
        with torch.no_grad():
            r5 = self.backbone.layer4(torch.from_numpy(pooled))
            return self.backbone.attnpool(r5).numpy()  # (R, EMBED)

    def predict(self, feats):
        """cosine/T classifier + class-wise bbox deltas (fast_rcnn.py:529-572)."""
        xn = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        wn = self.text_emb / np.maximum(
            np.linalg.norm(self.text_emb, axis=1, keepdims=True), 1e-12
        )
        cls = xn @ wn.T
        scores = np.concatenate([cls, np.zeros((len(feats), 1), np.float32)], 1) / 0.01
        deltas = feats @ self.bbox_w.T + self.bbox_b
        return scores.astype(np.float32), deltas.astype(np.float32)

    def fast_rcnn_inference(self, scores, deltas, proposal_boxes):
        """reference fast_rcnn.py:130-227 (single image)."""
        probs = torch.softmax(torch.from_numpy(scores), dim=-1).numpy()[:, :-1]  # (R, K)
        ih, iw = self.img_hw
        boxes = np.stack(
            [
                np.clip(
                    np_apply_deltas(deltas[:, 4 * k : 4 * k + 4], proposal_boxes),
                    [0, 0, 0, 0],
                    [iw, ih, iw, ih],
                )
                for k in range(NUM_CLASSES)
            ],
            axis=1,
        )  # (R, K, 4)
        rr, kk = np.nonzero(probs > SCORE_THRESH)
        cand_boxes = boxes[rr, kk].astype(np.float32)
        cand_scores = probs[rr, kk].astype(np.float32)
        cand_classes = kk.astype(np.int64)
        keep = np_batched_nms(cand_boxes, cand_scores, cand_classes, BOX_NMS)[:TOPK]
        return cand_boxes[keep], cand_scores[keep], cand_classes[keep]

    def inference(self, images_hwc):
        x = self.normalize(images_hwc)
        res4 = self.res4(x)
        logits, deltas, (h, w) = self.rpn_outputs(res4)
        anchors = np_anchor_grid(h, w)
        out = []
        for b in range(len(images_hwc)):
            pboxes, _ = self.find_top_rpn_proposals(logits[b], deltas[b], anchors, training=False)
            feats = self.region_embed(res4[b : b + 1], pboxes)
            scores, ds = self.predict(feats)
            out.append(self.fast_rcnn_inference(scores, ds, pboxes))
        return out

    # ---- train-mode losses (exhaustive sampling) ----
    def losses(self, images_hwc, gt_boxes, gt_classes):
        """gt_boxes: list of (Gi, 4); gt_classes: list of (Gi,)."""
        x = self.normalize(images_hwc)
        res4 = self.res4(x)
        logits, deltas, (h, w) = self.rpn_outputs(res4)
        anchors = np_anchor_grid(h, w)
        B = len(images_hwc)

        rpn_cls = rpn_loc = 0.0
        roi_ce = []
        roi_reg_sum = 0.0
        roi_count = 0
        for b in range(B):
            gtb, gtc = gt_boxes[b], gt_classes[b]
            # RPN losses (rpn.py:366-430), exhaustive sampling
            iou = np_pairwise_iou(gtb, anchors)
            midx, mlab = np_matcher(iou, (0.3, 0.7), (0, -1, 1), True)
            pos = mlab == 1
            sampled = mlab >= 0
            gt_deltas = np_get_deltas(anchors, gtb[midx], (1.0, 1.0, 1.0, 1.0))
            rpn_loc += np.abs(deltas[b] - gt_deltas)[pos].sum()
            z = torch.from_numpy(logits[b][sampled])
            t = torch.from_numpy(pos[sampled].astype(np.float32))
            rpn_cls += F.binary_cross_entropy_with_logits(z, t, reduction="sum").item()

            # RoI head losses (roi_heads.py label_and_sample + fast_rcnn losses)
            pboxes, _ = self.find_top_rpn_proposals(logits[b], deltas[b], anchors, training=True)
            pboxes = np.concatenate([pboxes, gtb], 0)  # add_ground_truth_to_proposals
            iou_p = np_pairwise_iou(gtb, pboxes)
            midx_p, mlab_p = np_matcher(iou_p, (0.5,), (0, 1), False)
            classes = np.where(mlab_p == 1, gtc[midx_p], NUM_CLASSES).astype(np.int64)
            feats = self.region_embed(res4[b : b + 1], pboxes)
            scores, ds = self.predict(feats)
            # focal-scaled CE + bg weight (fast_rcnn.py:624-644)
            z = torch.from_numpy(scores)
            t = torch.from_numpy(classes)
            ce = F.cross_entropy(z, t, reduction="none")
            p_t = torch.softmax(z, -1)[torch.arange(len(t)), t]
            ce = ce * (1 - p_t) ** FOCAL_GAMMA
            w_bg = torch.ones(len(t))
            w_bg[t == NUM_CLASSES] = BG_WEIGHT
            roi_ce.append((ce * w_bg).numpy())
            # box reg (fast_rcnn.py:646-683)
            fg = classes < NUM_CLASSES
            fg_deltas = ds.reshape(-1, NUM_CLASSES, 4)[fg, classes[fg]]
            gt_d = np_get_deltas(pboxes[fg], gtb[midx_p[fg]])
            roi_reg_sum += np.abs(fg_deltas - gt_d).sum()
            roi_count += len(classes)

        norm = self.rpn_batch * B
        return {
            "loss_rpn_cls": rpn_cls / norm,
            "loss_rpn_loc": rpn_loc / norm,
            "loss_cls": float(np.concatenate(roi_ce).mean()),
            "loss_box_reg": roi_reg_sum / roi_count,
        }


# ---------------- JAX side ----------------
def _jax_model(training=False, layers=(1, 1, 1, 1), width=WIDTH, embed=EMBED,
               rpn_batch=RPN_BATCH):
    return GeneralizedRCNN(
        backbone_layers=tuple(layers),
        backbone_width=width,
        embed_dim=embed,
        input_resolution=224,
        anchor_sizes=ANCHOR_SIZES,
        anchor_aspect_ratios=ASPECTS,
        rpn_batch_size_per_image=rpn_batch,
        rpn_positive_fraction=0.5,
        rpn_pre_nms_topk=PRE_NMS,
        rpn_post_nms_topk=POST_NMS,
        rpn_nms_thresh=RPN_NMS,
        num_classes=NUM_CLASSES,
        roi_batch_size_per_image=ROI_BATCH,
        roi_positive_fraction=0.5,
        use_text_emb=True,
        temperature=0.01,
        focal_gamma=FOCAL_GAMMA,
        bg_loss_weight=BG_WEIGHT,
        score_thresh_test=SCORE_THRESH,
        nms_thresh_test=BOX_NMS,
        detections_per_image=TOPK,
        pixel_mean=PIXEL_MEAN,
        pixel_std=PIXEL_STD,
        with_offline_backbone=False,
        v2l_mapper_layers=2,
        v2l_mapper_tokens=8,
    )


@pytest.fixture(scope="module")
def oracle_and_params(tmp_path_factory):
    from cddmsl_tpu.utils.testing import materialize_params

    ref = RefDetector()
    path = tmp_path_factory.mktemp("ckpt") / "ref_detector.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in ref.state_dict_d2().items()}}, str(path))

    model = _jax_model()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    params = load_rcnn_weights(params, str(path))
    return ref, model, params


def _batch(with_gt=False, img_hw=None, B=2, gt_spec=None):
    r = np.random.RandomState(3)
    ih, iw = (IMG, IMG) if img_hw is None else tuple(img_hw)
    imgs = (r.rand(B, ih, iw, 3) * 255).astype(np.float32)
    G = 8
    gtb = np.zeros((B, G, 4), np.float32)
    gtv = np.zeros((B, G), bool)
    gtc = np.zeros((B, G), np.int32)
    if with_gt and gt_spec is not None:
        for b, (boxes, classes) in enumerate(gt_spec):
            n = len(boxes)
            gtb[b, :n] = boxes
            gtc[b, :n] = classes
            gtv[b, :n] = True
    elif with_gt:
        gtb[0, :3] = [[12, 20, 72, 90], [30, 40, 100, 110], [60, 8, 120, 60]]
        gtc[0, :3] = [0, 3, 5]
        gtv[0, :3] = True
        gtb[1, :2] = [[8, 8, 56, 64], [40, 52, 116, 120]]
        gtc[1, :2] = [2, 4]
        gtv[1, :2] = True
    return DetBatch(
        image=jnp.asarray(imgs),
        image_sizes=jnp.asarray([[ih, iw]] * B, jnp.int32),
        orig_sizes=jnp.asarray([[ih, iw]] * B, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.asarray(gtc),
        gt_valid=jnp.asarray(gtv),
        image_trgt=jnp.asarray(imgs),
    )


def _np_images(batch):
    return np.asarray(batch.image)


# ---------------- tests ----------------
def test_rpn_proposal_parity(oracle_and_params):
    """Post-NMS RPN proposal sets must match (find_top_rpn_proposals vs the
    jitted static-shape path)."""
    ref, model, params = oracle_and_params
    batch = _batch()

    def _props(m, b):
        feats = m.backbone(m._normalize(b.image))["res4"]
        return m.proposal_generator(feats, b.image_sizes, training=False)[0]

    props = model.apply(params, batch, method=_props)
    x = ref.normalize(_np_images(batch))
    res4 = ref.res4(x)
    logits, deltas, (h, w) = ref.rpn_outputs(res4)
    anchors = np_anchor_grid(h, w)

    for b in range(2):
        want_boxes, want_scores = ref.find_top_rpn_proposals(
            logits[b], deltas[b], anchors, training=False
        )
        valid = np.asarray(props.valid[b])
        got_boxes = np.asarray(props.boxes[b])[valid]
        got_scores = np.asarray(props.scores[b])[valid]
        assert len(got_boxes) == len(want_boxes), (
            f"img {b}: kept {len(got_boxes)} vs oracle {len(want_boxes)}"
        )
        # both sides emit score-descending
        np.testing.assert_allclose(got_scores, want_scores, atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(got_boxes, want_boxes, atol=2e-2)


def test_detector_inference_parity(oracle_and_params):
    """The composed eval pipeline must keep the SAME post-NMS detections:
    same count, same classes, boxes/scores numerically equal."""
    ref, model, params = oracle_and_params
    batch = _batch()
    det = model.apply(params, batch, False, method=model.inference)
    want = ref.inference(_np_images(batch))

    for b in range(2):
        wb, ws, wc = want[b]
        valid = np.asarray(det.valid[b])
        gb = np.asarray(det.boxes[b])[valid]
        gs = np.asarray(det.scores[b])[valid]
        gc = np.asarray(det.classes[b])[valid]
        assert len(gb) == len(wb), f"img {b}: {len(gb)} vs oracle {len(wb)} detections"
        # score-descending on both sides -> direct row alignment
        np.testing.assert_array_equal(gc, wc)
        np.testing.assert_allclose(gs, ws, atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(gb, wb, atol=5e-2)


def test_train_loss_parity(oracle_and_params):
    """Composed train-mode losses under exhaustive sampling: the sampled SET
    is deterministic (quotas exceed candidates), so the padded-JAX losses
    must equal the dynamic torch-oracle losses without shared RNG."""
    ref, model, params = oracle_and_params
    batch = _batch(with_gt=True)
    losses = model.apply(
        params, batch, jax.random.PRNGKey(17), method=model.supervised_losses
    )
    gtb = np.asarray(batch.gt_boxes)
    gtc = np.asarray(batch.gt_classes)
    gtv = np.asarray(batch.gt_valid)
    want = ref.losses(
        _np_images(batch),
        [gtb[b][gtv[b]] for b in range(2)],
        [gtc[b][gtv[b]] for b in range(2)],
    )
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        got = float(losses[k])
        np.testing.assert_allclose(got, want[k], rtol=5e-3, atol=1e-4, err_msg=k)
