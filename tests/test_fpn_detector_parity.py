"""Composed FPN detector-level torch/numpy-oracle parity.

Extends the C4 harness (test_torch_parity_detector.py, VERDICT round-2 #1)
to the reference's most-used family, Base-RCNN-FPN: the pieces C4 parity
cannot see are exactly the FPN-specific ones —

    bottom-up + FPN feature construction (backbone/fpn.py)
    shared RPN head over p2..p6, PER-LEVEL pre-NMS top-k, per-level NMS via
      level ids + global post-NMS top-k (proposal_utils.py:60-110)
    RoI level assignment (poolers.py assign_boxes_to_levels, FPN eq. 1)
    multi-level RoIAlign -> 2-FC box head (NCHW-flatten fc1)
    softmax(K+1, bg last) fast_rcnn_inference (fast_rcnn.py:130-227)

The oracle composes the torch modules from test_fpn_checkpoint (d2
checkpoint naming, weights flow through convert_d2_fpn_rcnn/load dialect)
with the numpy d2-semantics ops from test_torch_parity_detector. Both sides
use the static 2-sample RoIAlign grid (this repo's documented
sampling_ratio=0 mapping).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_fpn_checkpoint import _full_torch_sd, _tiny_fpn_rcnn, K  # noqa: E402
from test_torch_parity_detector import (  # noqa: E402
    np_apply_deltas,
    np_batched_nms,
    np_roi_align,
)

STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECTS = (0.5, 1.0, 2.0)
H, W = 64, 96
# TEST-time selection (the jitted path runs inference):
# _tiny_fpn_rcnn has rpn_pre_nms_topk=(64, 32), rpn_post_nms_topk=(32, 16)
PRE_K, POST_K = 32, 16
RPN_NMS = 0.7
SCORE_THRESH = 0.05
BOX_NMS = 0.5
TOPK = 8


def _cell_anchors(size):
    out = []
    area = size ** 2
    for ar in ASPECTS:
        w = np.sqrt(area / ar)
        h = ar * w
        out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, np.float32)


def _anchor_grid(h, w, stride, cells):
    sx, sy = np.meshgrid(np.arange(w) * stride, np.arange(h) * stride)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], 1)
    return (shifts[:, None, :] + cells[None, :, :]).reshape(-1, 4).astype(np.float32)


def _clip(boxes, hw):
    out = boxes.copy()
    out[:, 0::2] = out[:, 0::2].clip(0, hw[1])
    out[:, 1::2] = out[:, 1::2].clip(0, hw[0])
    return out


class _Oracle:
    """Reference-faithful FPN eval pipeline on the torch modules."""

    def __init__(self, mods):
        self.m = mods

    def features(self, x_nchw):
        with torch.no_grad():
            levels = self.m["fpn"](self.m["bottom_up"](torch.from_numpy(x_nchw)))
        return [lv.numpy() for lv in levels]  # p2..p6

    def rpn_raw(self, levels_i):
        """Per-level flattened (logits, deltas, anchors) for ONE image, in
        this repo's (H, W, A) flatten order (d2's permute(0,2,3,1))."""
        out = []
        with torch.no_grad():
            for feat, stride, size in zip(levels_i, STRIDES, ANCHOR_SIZES):
                t = torch.from_numpy(feat[None])
                h = torch.relu(self.m["rpn_conv"](t))
                logits = np.transpose(self._logits_np(h), (1, 2, 0)).reshape(-1)
                deltas = np.transpose(self._deltas_np(h), (1, 2, 0)).reshape(-1, 4)
                anchors = _anchor_grid(feat.shape[1], feat.shape[2], stride, _cell_anchors(size))
                out.append((logits, deltas, anchors))
        return out

    def rpn(self, levels_i, pre_k=PRE_K, post_k=POST_K):
        """levels_i: per-level (C, H_l, W_l) for ONE image -> (boxes, scores)
        post-NMS proposals (reference find_top_rpn_proposals)."""
        cand_b, cand_s, cand_l = [], [], []
        for lvl, (logits, deltas, anchors) in enumerate(self.rpn_raw(levels_i)):
            k = min(pre_k, len(anchors))
            order = np.argsort(-logits, kind="stable")[:k]
            boxes = np_apply_deltas(deltas[order], anchors[order], (1.0, 1.0, 1.0, 1.0))
            boxes = _clip(boxes, (H, W))
            ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            cand_b.append(boxes)
            cand_s.append(np.where(ok, logits[order], -np.inf))
            cand_l.append(np.full(k, lvl))
        boxes = np.concatenate(cand_b)
        scores = np.concatenate(cand_s)
        lvls = np.concatenate(cand_l)
        keep = np_batched_nms(boxes, scores, lvls, RPN_NMS)
        keep = [i for i in keep if np.isfinite(scores[i])][:post_k]
        return boxes[keep], scores[keep]

    def _logits_np(self, h):
        with torch.no_grad():
            # rpn objectness conv shares sd naming with the jax head
            import torch.nn.functional as F

            w = self.m_sd["proposal_generator.rpn_head.objectness_logits.weight"]
            b = self.m_sd["proposal_generator.rpn_head.objectness_logits.bias"]
            return F.conv2d(h, torch.from_numpy(w), torch.from_numpy(b)).numpy()[0]

    def _deltas_np(self, h):
        with torch.no_grad():
            import torch.nn.functional as F

            w = self.m_sd["proposal_generator.rpn_head.anchor_deltas.weight"]
            b = self.m_sd["proposal_generator.rpn_head.anchor_deltas.bias"]
            return F.conv2d(h, torch.from_numpy(w), torch.from_numpy(b)).numpy()[0]

    def roi(self, levels_i, boxes):
        """(R, 4) proposals -> final (boxes, scores, classes)."""
        if len(boxes) == 0:
            return np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64)
        area = np.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6)
        lvl = np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)).clip(2, 5).astype(int)
        pooled = np.zeros((len(boxes), levels_i[0].shape[0], 7, 7), np.float32)
        for i, (b, l) in enumerate(zip(boxes, lvl)):
            pooled[i] = np_roi_align(
                levels_i[l - 2], b[None], out=7, scale=1.0 / STRIDES[l - 2], sampling=2
            )[0]
        with torch.no_grad():
            x = torch.from_numpy(pooled).flatten(1)
            x = torch.relu(self.m["fc1"](x))
            x = torch.relu(self.m["fc2"](x))
            logits = self.m["cls_score"](x).numpy()
            deltas = self.m["bbox_pred"](x).numpy()
        probs = np.exp(logits - logits.max(1, keepdims=True))
        probs = probs / probs.sum(1, keepdims=True)
        probs = probs[:, :-1]  # drop bg (last)
        out_b, out_s, out_c = [], [], []
        for c in range(K):
            db = np_apply_deltas(deltas[:, c * 4 : c * 4 + 4], boxes, (10.0, 10.0, 5.0, 5.0))
            db = _clip(db, (H, W))
            sel = probs[:, c] > SCORE_THRESH
            out_b.append(db[sel])
            out_s.append(probs[sel, c])
            out_c.append(np.full(sel.sum(), c))
        boxes_f = np.concatenate(out_b)
        scores_f = np.concatenate(out_s)
        classes_f = np.concatenate(out_c)
        keep = np_batched_nms(boxes_f, scores_f, classes_f, BOX_NMS)[:TOPK]
        return boxes_f[keep], scores_f[keep], classes_f[keep]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.RandomState(11)
    sd, mods = _full_torch_sd(rng)
    mods["bottom_up"].eval()
    path = str(tmp_path_factory.mktemp("fpnck") / "fpn.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    model = _tiny_fpn_rcnn(mask_on=False)
    # structured, detection-like images: blobs on noise
    x = rng.rand(2, 3, H, W).astype(np.float32) * 0.2
    for i in range(2):
        for _ in range(3):
            cx, cy = rng.randint(10, W - 10), rng.randint(10, H - 10)
            x[i, :, max(0, cy - 8) : cy + 8, max(0, cx - 12) : cx + 12] += rng.rand(3, 1, 1)
    x = x.clip(0, 1)

    from cddmsl_tpu.checkpoint.convert_torch import load_rcnn_weights
    from cddmsl_tpu.models import DetBatch

    batch = DetBatch(
        image=jnp.asarray(x.transpose(0, 2, 3, 1)) * 255.0,
        image_sizes=jnp.asarray([[H, W]] * 2, jnp.int32),
        orig_sizes=jnp.asarray([[H, W]] * 2, jnp.int32),
        gt_boxes=jnp.zeros((2, 4, 4), jnp.float32),
        gt_classes=jnp.zeros((2, 4), jnp.int32),
        gt_valid=jnp.zeros((2, 4), bool),
    )
    params = model.init(jax.random.PRNGKey(0), batch, method=model.inference)
    params = load_rcnn_weights(params, path)

    oracle = _Oracle(mods)
    oracle.m_sd = sd
    return oracle, model, params, batch, x


def test_fpn_rpn_proposal_parity(setup):
    """Identical post-NMS proposal sets per image."""
    oracle, model, params, batch, x = setup
    jb, js = jax.device_get(
        model.apply(
            params,
            [jnp.asarray(l) for l in _nhwc_levels(oracle, x)],
            batch.image_sizes,
            False,
            method=_rpn_method(model),
        )[0][:2]
    )
    for i in range(2):
        levels_i = [lv[i] for lv in oracle.features(x)]
        ob, os_ = oracle.rpn(levels_i)
        got_valid = np.isfinite(js[i])
        got_b, got_s = jb[i][got_valid], js[i][got_valid]
        assert len(got_b) == len(ob), (len(got_b), len(ob))
        # both sides keep score order
        np.testing.assert_allclose(got_s, os_, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(got_b, ob, atol=5e-2)


def _nhwc_levels(oracle, x):
    return [lv.transpose(0, 2, 3, 1) for lv in oracle.features(x)]


def _rpn_method(model):
    def run(self, levels, image_sizes, training):
        return self.proposal_generator(levels, image_sizes, training=training)

    return run


def test_fpn_train_loss_parity(setup):
    """Composed FPN train losses under exhaustive sampling (reference
    rpn.py:366-430 multi-level anchor matching + roi_heads
    label_and_sample_proposals with add_ground_truth_to_proposals +
    fast_rcnn.py softmax CE / smooth-L1): quotas exceed candidate counts, so
    the sampled SET is deterministic and the padded-JAX and numpy losses
    must agree without matching RNG streams."""
    import torch.nn.functional as F

    from test_torch_parity_detector import (
        np_get_deltas,
        np_matcher,
        np_pairwise_iou,
    )

    from cddmsl_tpu.checkpoint.convert_torch import load_rcnn_weights
    from cddmsl_tpu.models import DetBatch

    oracle, _, _, _, x = setup
    RPN_BATCH, ROI_BATCH = 4096, 128  # >= candidates: exhaustive
    model = _tiny_fpn_rcnn(
        mask_on=False,
        rpn_batch_size_per_image=RPN_BATCH,
        roi_batch_size_per_image=ROI_BATCH,
        roi_positive_fraction=0.5,
    )

    rng = np.random.RandomState(7)
    G = 4
    gtb = np.zeros((2, G, 4), np.float32)
    gtc = rng.randint(0, K, (2, G)).astype(np.int32)
    for i in range(2):
        for g in range(G):
            x0 = rng.randint(0, W - 24)
            y0 = rng.randint(0, H - 20)
            gtb[i, g] = (x0, y0, x0 + 12 + rng.randint(12), y0 + 10 + rng.randint(10))
    batch = DetBatch(
        image=jnp.asarray(x.transpose(0, 2, 3, 1)) * 255.0,
        image_sizes=jnp.asarray([[H, W]] * 2, jnp.int32),
        orig_sizes=jnp.asarray([[H, W]] * 2, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.asarray(gtc),
        gt_valid=jnp.ones((2, G), bool),
    )
    import tempfile

    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method=model.supervised_losses,
    )
    with tempfile.TemporaryDirectory() as td:
        pth = td + "/fpn.pth"
        torch.save({k: torch.from_numpy(v) for k, v in oracle.m_sd.items()}, pth)
        params = load_rcnn_weights(params, pth)
    got = jax.device_get(
        model.apply(params, batch, jax.random.PRNGKey(2), method=model.supervised_losses)
    )

    # ---- oracle ----
    rpn_cls = rpn_loc = 0.0
    roi_ce, roi_reg_sum, roi_count = [], 0.0, 0
    for i in range(2):
        levels_i = [lv[i] for lv in oracle.features(x)]
        raw = oracle.rpn_raw(levels_i)
        logits = np.concatenate([r[0] for r in raw])
        deltas = np.concatenate([r[1] for r in raw])
        anchors = np.concatenate([r[2] for r in raw])
        iou = np_pairwise_iou(gtb[i], anchors)
        midx, mlab = np_matcher(iou, (0.3, 0.7), (0, -1, 1), True)
        pos = mlab == 1
        sampled = mlab >= 0
        gt_deltas = np_get_deltas(anchors, gtb[i][midx], (1.0, 1.0, 1.0, 1.0))
        rpn_loc += np.abs(deltas - gt_deltas)[pos].sum()
        z = torch.from_numpy(logits[sampled])
        t = torch.from_numpy(pos[sampled].astype(np.float32))
        rpn_cls += F.binary_cross_entropy_with_logits(z, t, reduction="sum").item()

        # RoI: train-mode proposals + gt appended
        pboxes, _ = oracle.rpn(levels_i, pre_k=64, post_k=32)  # TRAIN topks
        pboxes = np.concatenate([pboxes, gtb[i]], axis=0)
        iou_p = np_pairwise_iou(gtb[i], pboxes)
        midx_p, mlab_p = np_matcher(iou_p, (0.5,), (0, 1), False)
        classes = np.where(mlab_p == 1, gtc[i][midx_p], K).astype(np.int64)
        _, scores, ds = _oracle_roi_raw(oracle, levels_i, pboxes)
        z = torch.from_numpy(scores)
        t = torch.from_numpy(classes)
        roi_ce.append(F.cross_entropy(z, t, reduction="none").numpy())
        fg = classes < K
        fg_deltas = ds.reshape(-1, K, 4)[fg, classes[fg]]
        gt_d = np_get_deltas(pboxes[fg], gtb[i][midx_p[fg]], (10.0, 10.0, 5.0, 5.0))
        roi_reg_sum += np.abs(fg_deltas - gt_d).sum()
        roi_count += len(classes)

    want = {
        "loss_rpn_cls": rpn_cls / (RPN_BATCH * 2),
        "loss_rpn_loc": rpn_loc / (RPN_BATCH * 2),
        "loss_cls": float(np.concatenate(roi_ce).mean()),
        "loss_box_reg": roi_reg_sum / roi_count,
    }
    for k_, v in want.items():
        np.testing.assert_allclose(float(got[k_]), v, rtol=2e-3, atol=2e-4), k_


def _oracle_roi_raw(oracle, levels_i, boxes):
    """Pooled features -> (feats, cls logits, deltas) for given boxes."""
    area = np.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6)
    lvl = np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)).clip(2, 5).astype(int)
    pooled = np.zeros((len(boxes), levels_i[0].shape[0], 7, 7), np.float32)
    for i, (b, l) in enumerate(zip(boxes, lvl)):
        pooled[i] = np_roi_align(
            levels_i[l - 2], b[None], out=7, scale=1.0 / STRIDES[l - 2], sampling=2
        )[0]
    with torch.no_grad():
        xx = torch.from_numpy(pooled).flatten(1)
        xx = torch.relu(oracle.m["fc1"](xx))
        xx = torch.relu(oracle.m["fc2"](xx))
        return xx.numpy(), oracle.m["cls_score"](xx).numpy(), oracle.m["bbox_pred"](xx).numpy()


def test_fpn_detector_inference_parity(setup):
    """Same final detections (kept set, classes, scores, boxes) end-to-end
    through the jitted FPNRCNN.inference."""
    oracle, model, params, batch, x = setup
    det = jax.device_get(
        jax.jit(lambda p, b: model.apply(p, b, method=model.inference))(params, batch)
    )
    for i in range(2):
        levels_i = [lv[i] for lv in oracle.features(x)]
        pb, _ = oracle.rpn(levels_i)
        ob, os_, oc = oracle.roi(levels_i, pb)
        valid = det.valid[i]
        gb, gs, gc = det.boxes[i][valid], det.scores[i][valid], det.classes[i][valid]
        assert len(gb) == len(ob), (len(gb), len(ob))
        order_o = np.argsort(-os_, kind="stable")
        order_g = np.argsort(-gs, kind="stable")
        np.testing.assert_array_equal(gc[order_g], oc[order_o])
        np.testing.assert_allclose(gs[order_g], os_[order_o], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(gb[order_g], ob[order_o], atol=6e-2)
