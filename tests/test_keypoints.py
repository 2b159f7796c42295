"""Keypoint path end-to-end (VERDICT round-2 item 3): GT keypoints flow
through transforms -> DetBatch -> KRCNN head loss -> heatmap decode ->
OKS-matched keypoints AP. Reference: detectron2/structures/keypoints.py,
modeling/roi_heads/keypoint_head.py:272, evaluation/coco_evaluation.py
keypoints task + pycocotools computeOks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cddmsl_tpu.data.transforms import (
    HFlipTransform,
    ResizeTransform,
    TransformList,
    create_keypoint_hflip_indices,
    transform_keypoint_annotations,
)


# ---------------- transforms ----------------
def test_keypoint_hflip_swaps_and_unlabels():
    class Meta:
        def __init__(self):
            self._d = {
                "keypoint_names": ("left_eye", "right_eye", "nose"),
                "keypoint_flip_map": (("left_eye", "right_eye"),),
            }

        def get(self, k, default=None):
            return self._d.get(k, default)

    idx = create_keypoint_hflip_indices(Meta())
    np.testing.assert_array_equal(idx, [1, 0, 2])

    kp = np.array([[10, 20, 2], [30, 20, 1], [20, 25, 2]], np.float32)
    tfms = TransformList([HFlipTransform(width=100)])
    out = transform_keypoint_annotations(kp, tfms, (50, 100), idx)
    # after flip x -> 100 - x, then left/right swapped
    np.testing.assert_allclose(out[0], [70, 20, 1])  # was right_eye
    np.testing.assert_allclose(out[1], [90, 20, 2])  # was left_eye
    np.testing.assert_allclose(out[2], [80, 25, 2])


def test_keypoint_out_of_bounds_unlabeled():
    kp = np.array([[10, 20, 2], [90, 40, 2]], np.float32)
    # resize 100x100 -> 200x50: second keypoint y=20 stays, x=180 > image? no;
    # use a crop-like resize to push one out
    tfms = TransformList([ResizeTransform(100, 100, 50, 200)])
    out = transform_keypoint_annotations(kp, tfms, (30, 200), None)
    assert out[0][2] == 2  # (20, 10) -> in bounds
    # y 40 -> 20 > 30? no: y scales 100->50 so y=20 <= 30 stays; x 90->180 <= 200
    # craft an out-of-bounds case explicitly:
    out2 = transform_keypoint_annotations(
        np.array([[199, 99, 2]], np.float32), tfms, (10, 200), None
    )
    assert out2[0][2] == 0 and out2[0][0] == 0 and out2[0][1] == 0


# ---------------- heatmap targets round-trip ----------------
def test_heatmap_target_decode_roundtrip():
    """keypoints_to_heatmap_targets followed by the static decode recovers
    the keypoint location to within one heatmap bin."""
    from cddmsl_tpu.models.keypoint_head import KeypointROIHeads

    boxes = jnp.asarray([[10.0, 20, 74, 84]])
    kp = jnp.asarray([[[26.0, 36, 2], [42, 52, 2], [73.9, 83.9, 2]]])  # (1, 3, 3)
    size = 56
    pos, vis = KeypointROIHeads.keypoints_to_heatmap_targets(kp, boxes, size)
    assert bool(vis.all())
    # decode bin centers back
    ky, kx = pos[0] // size, pos[0] % size
    bw = bh = 64.0
    px = 10 + (kx + 0.5) * bw / size
    py = 20 + (ky + 0.5) * bh / size
    np.testing.assert_allclose(np.asarray(px), [26, 42, 73.9], atol=bw / size)
    np.testing.assert_allclose(np.asarray(py), [36, 52, 83.9], atol=bh / size)


# ---------------- model e2e ----------------
def _kp_cfg():
    from cddmsl_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.TPU.BACKBONE_LAYERS = [1, 1, 1, 1]
    cfg.TPU.BACKBONE_WIDTH = 16
    cfg.TPU.EMBED_DIM = 64
    cfg.TPU.V2L_MAPPER_LAYERS = 2
    cfg.TPU.V2L_MAPPER_TOKENS = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 3
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = [16, 16]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def kp_model_and_params():
    from cddmsl_tpu.models import DetBatch, build_model
    from cddmsl_tpu.utils.testing import materialize_params

    cfg = _kp_cfg()
    model = build_model(cfg)
    b = _kp_batch()
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r, bb: model.init({"params": r}, bb, r, method=model.init_all), rng, b
    )
    return model, params


def _kp_batch():
    from cddmsl_tpu.models import DetBatch

    B, H, W, G, K = 2, 96, 96, 4, 3
    r = np.random.RandomState(0)
    gtb = np.zeros((B, G, 4), np.float32)
    gtv = np.zeros((B, G), bool)
    gtk = np.zeros((B, G, K, 3), np.float32)
    gtb[0, 0] = [10, 10, 70, 80]
    gtk[0, 0] = [[20, 25, 2], [40, 45, 2], [60, 70, 1]]
    gtv[0, 0] = True
    gtb[1, 0] = [30, 20, 90, 90]
    gtk[1, 0] = [[40, 35, 2], [60, 55, 2], [80, 80, 0]]
    gtv[1, 0] = True
    return DetBatch(
        image=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        orig_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_classes=jnp.zeros((B, G), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        image_trgt=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        gt_keypoints=jnp.asarray(gtk),
    )


def test_keypoint_train_loss_finite(kp_model_and_params):
    model, params = kp_model_and_params
    losses = model.apply(params, _kp_batch(), jax.random.PRNGKey(1), method=model.supervised_losses)
    assert "loss_keypoint" in losses
    assert np.isfinite(float(losses["loss_keypoint"]))


def test_keypoint_inference_decodes(kp_model_and_params):
    model, params = kp_model_and_params
    det = model.apply(params, _kp_batch(), method=model.inference)
    assert det.keypoints is not None
    assert det.keypoints.shape == (2, 8, 3, 3)  # (B, D, K, (x, y, score))
    kp = np.asarray(det.keypoints)
    boxes = np.asarray(det.boxes)
    valid = np.asarray(det.valid)
    # decoded keypoints lie inside their detection boxes
    for b in range(2):
        for d in np.nonzero(valid[b])[0]:
            x1, y1, x2, y2 = boxes[b, d]
            assert (kp[b, d, :, 0] >= x1 - 1e-3).all() and (kp[b, d, :, 0] <= x2 + 1e-3).all()
            assert (kp[b, d, :, 1] >= y1 - 1e-3).all() and (kp[b, d, :, 1] <= y2 + 1e-3).all()


# ---------------- evaluator ----------------
def test_keypoints_ap_perfect_and_degraded():
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator

    name = "kp_eval_fixture"
    if MetadataCatalog.get(name).get("thing_classes") is None:
        MetadataCatalog.get(name).set(
            thing_classes=["person"], evaluator_type="coco",
            keypoint_oks_sigmas=(0.05, 0.05, 0.05),
        )
    gt_boxes = np.array([[10, 10, 70, 80], [30, 20, 90, 90]], np.float64)
    gt_kp = np.array(
        [[[20, 25, 2], [40, 45, 2], [60, 70, 2]],
         [[40, 35, 2], [60, 55, 2], [80, 80, 2]]], np.float64
    )

    ev = COCOEvaluator(name, tasks=("bbox", "keypoints"))
    ev.process(1, gt_boxes, np.array([0.9, 0.8]), np.array([0, 0]), keypoints=gt_kp)
    ev.process_gt(1, gt_boxes, np.array([0, 0]), keypoints=gt_kp)
    res = ev.evaluate()
    assert res["keypoints"]["AP"] == pytest.approx(100.0)

    # shift predictions by several OKS sigmas -> AP collapses
    ev2 = COCOEvaluator(name, tasks=("bbox", "keypoints"))
    bad = gt_kp.copy()
    bad[:, :, :2] += 25.0
    ev2.process(1, gt_boxes, np.array([0.9, 0.8]), np.array([0, 0]), keypoints=bad)
    ev2.process_gt(1, gt_boxes, np.array([0, 0]), keypoints=gt_kp)
    res2 = ev2.evaluate()
    assert res2["keypoints"]["AP"] < 10.0
    # bbox task unaffected
    assert res2["bbox"]["AP"] == pytest.approx(100.0)


def test_oks_matches_pycocotools_formula():
    """_oks_matrix vs a direct transcription of pycocotools computeOks."""
    from cddmsl_tpu.evaluation.coco_eval import _oks_matrix

    r = np.random.RandomState(7)
    K = 5
    sigmas = np.abs(r.rand(K)) * 0.2 + 0.02
    gt_boxes = np.array([[5, 5, 60, 70], [20, 10, 80, 60]], np.float64)
    gt_kp = r.rand(2, K, 3) * 60 + 5
    gt_kp[:, :, 2] = r.randint(0, 3, (2, K))
    gt_kp[0, :, 2] = np.maximum(gt_kp[0, :, 2], 1)  # ensure some labeled
    det_kp = r.rand(3, K, 3) * 60 + 5

    got = _oks_matrix(det_kp, gt_kp, gt_boxes, sigmas)

    var = (sigmas * 2) ** 2
    for g in range(2):
        xg, yg, vg = gt_kp[g, :, 0], gt_kp[g, :, 1], gt_kp[g, :, 2]
        area = (gt_boxes[g, 2] - gt_boxes[g, 0]) * (gt_boxes[g, 3] - gt_boxes[g, 1])
        k1 = (vg > 0).sum()
        for d in range(3):
            xd, yd = det_kp[d, :, 0], det_kp[d, :, 1]
            if k1 > 0:
                e = ((xd - xg) ** 2 + (yd - yg) ** 2) / var / (area + np.spacing(1)) / 2
                want = np.mean(np.exp(-e[vg > 0]))
            else:
                continue
            np.testing.assert_allclose(got[d, g], want, rtol=1e-12)


# ---------------- loader path ----------------
def test_synthetic_coco_keypoint_loader(tmp_path):
    """COCO-json keypoints flow through the mapper + collation into
    DetBatch.gt_keypoints."""
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.build import build_detection_train_loader
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_coco

    register_synthetic_coco(str(tmp_path), prefix="synthetic_coco_kptest", with_keypoints=True)
    cfg = _kp_cfg()
    cfg.DATASETS.TRAIN = ["synthetic_coco_kptest_train"]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.INPUT.MIN_SIZE_TRAIN = [96]
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.TPU.PAD_SIZE_TRAIN = [96, 144]
    cfg.DATALOADER.NUM_WORKERS = 0
    loader = build_detection_train_loader(cfg, seed=0)
    batch = next(loader)
    assert batch.gt_keypoints is not None
    assert batch.gt_keypoints.shape[2:] == (3, 3)
    kp = np.asarray(batch.gt_keypoints)
    gtv = np.asarray(batch.gt_valid)
    gtb = np.asarray(batch.gt_boxes)
    assert gtv.any()
    # visible keypoints lie inside their GT boxes (transform consistency)
    b, g = np.nonzero(gtv)
    for bi, gi in zip(b, g):
        vis = kp[bi, gi, :, 2] > 0
        assert vis.any()
        x1, y1, x2, y2 = gtb[bi, gi]
        assert (kp[bi, gi, vis, 0] >= x1 - 1.5).all() and (kp[bi, gi, vis, 0] <= x2 + 1.5).all()
        assert (kp[bi, gi, vis, 1] >= y1 - 1.5).all() and (kp[bi, gi, vis, 1] <= y2 + 1.5).all()
