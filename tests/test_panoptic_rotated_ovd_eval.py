"""Panoptic PQ evaluator, rotated COCO evaluator, and OVD split metrics.

Covers the three evaluation surfaces added for reference parity:
  * COCOPanopticEvaluator + native pq_compute_single_image vs hand-computed
    PQ values incl. the panopticapi VOID and crowd rules
    (reference detectron2/evaluation/panoptic_evaluation.py:24-165, which
    delegates to panopticapi pq_compute);
  * RotatedCOCOEvaluator (reference rotated_coco_evaluation.py:15-207);
  * the generalized zero-shot AP50 splits for the 65-class COCO-OVD setting
    (reference coco_evaluation.py:344-374).
"""

import numpy as np
import pytest

from cddmsl_tpu.evaluation.panoptic_eval import (
    COCOPanopticEvaluator,
    PQStat,
    pq_compute_single_image,
)


def _seg(sid, cat, isthing=True, iscrowd=0):
    return {"id": sid, "category_id": cat, "isthing": isthing, "iscrowd": iscrowd}


def test_pq_exact_two_matches():
    # GT: thing cat 0 rows 0-4; stuff cat 5 rows 5-9 (10x10 image)
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    gt[5:] = 2
    gt_segs = [_seg(1, 0, True), _seg(2, 5, False)]
    # Pred: thing rows 0-3 (IoU 40/50 = .8), stuff rows 4-9 (IoU 50/60)
    pr = np.zeros((10, 10), np.int32)
    pr[:4] = 1
    pr[4:] = 2
    pr_segs = [_seg(1, 0, True), _seg(2, 5, False)]

    stat = pq_compute_single_image(gt, gt_segs, pr, pr_segs)
    iou_th, tp_th, fp_th, fn_th = stat.stats[(0, True)]
    assert (tp_th, fp_th, fn_th) == (1, 0, 0)
    assert iou_th == pytest.approx(40 / 50)
    iou_st = stat.stats[(5, False)][0]
    assert iou_st == pytest.approx(50 / 60)

    ev = COCOPanopticEvaluator("synth")
    ev.process_gt("img", gt, gt_segs)
    ev.process("img", pr, pr_segs)
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ_th"] == pytest.approx(100 * 0.8)
    assert res["PQ_st"] == pytest.approx(100 * 50 / 60)
    assert res["PQ"] == pytest.approx(100 * (0.8 + 50 / 60) / 2)
    assert res["RQ"] == pytest.approx(100.0)  # all matched
    assert res["SQ"] == pytest.approx(res["PQ"])  # RQ == 1 -> SQ == PQ


def test_pq_fp_fn_denominators():
    gt = np.zeros((8, 8), np.int32)
    gt[:4] = 1  # cat 0 thing, never predicted -> FN
    gt[4:] = 2  # cat 3 stuff (so the pred below is NOT over void)
    gt_segs = [_seg(1, 0, True), _seg(2, 3, False)]
    pr = np.zeros((8, 8), np.int32)
    pr[4:] = 9  # cat 0 thing over the cat-3 stuff region -> category
    # mismatch, not void-ignored (pixels are labeled GT) -> FP
    pr_segs = [_seg(9, 0, True)]
    stat = pq_compute_single_image(gt, gt_segs, pr, pr_segs)
    iou, tp, fp, fn = stat.stats[(0, True)]
    assert (iou, tp, fp, fn) == (0.0, 0, 1, 1)
    assert stat.stats[(3, False)][3] == 1  # the stuff GT is a FN
    avg = stat.average()
    assert avg["pq"] == 0.0 and avg["rq"] == 0.0 and avg["n"] == 2


def test_pq_mismatched_category_and_isthing():
    gt = np.zeros((6, 6), np.int32)
    gt[:] = 1
    pr = gt.copy()
    # same pixels, same numeric category id, but thing vs stuff -> no match
    stat = pq_compute_single_image(
        gt, [_seg(1, 3, True)], pr, [_seg(1, 3, False)]
    )
    assert stat.stats[(3, True)][3] == 1  # FN
    assert stat.stats[(3, False)][2] == 1  # FP


def test_pq_void_rule():
    # GT: small segment, rest VOID. Pred: big segment mostly over VOID.
    gt = np.zeros((10, 10), np.int32)
    gt[0, :4] = 1  # 4 px, cat 2
    gt_segs = [_seg(1, 2, True)]
    pr = np.zeros((10, 10), np.int32)
    pr[:, :] = 7  # 100 px covering everything, cat 2
    pr_segs = [_seg(7, 2, True)]
    stat = pq_compute_single_image(gt, gt_segs, pr, pr_segs)
    # match check: inter 4, union = 100 + 4 - 4 - |void ∩ pred|=96 -> 4/4=1.. wait
    # void∩pred = 96, union = 100 + 4 - 4 - 96 = 4, IoU = 4/4 = 1 -> TP
    # (panopticapi semantics: void GT pixels don't count against the pred)
    iou, tp, fp, fn = stat.stats[(2, True)]
    assert tp == 1 and iou == pytest.approx(1.0)

    # unmatched pred >50% inside void is ignored, not FP
    gt2 = np.zeros((10, 10), np.int32)
    gt2[0, 0] = 1
    pr2 = np.zeros((10, 10), np.int32)
    pr2[5:, :] = 7  # 50 px all in void, different cat -> ignored
    stat2 = pq_compute_single_image(gt2, [_seg(1, 2, True)], pr2, [_seg(7, 3, True)])
    assert stat2.stats[(3, True)][2] == 0  # no FP
    assert stat2.stats[(2, True)][3] == 1  # the GT is a FN


def test_pq_crowd_rule():
    # crowd GT never matches and is no FN; unmatched same-class pred mostly
    # inside the crowd region is ignored
    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1  # crowd, cat 4
    gt[5:] = 2  # real, cat 4
    gt_segs = [_seg(1, 4, True, iscrowd=1), _seg(2, 4, True)]
    pr = np.zeros((10, 10), np.int32)
    pr[:4] = 3  # 40 px inside crowd (cat 4): unmatched but ignored
    pr[5:] = 8  # exact match of real segment
    pr_segs = [_seg(3, 4, True), _seg(8, 4, True)]
    stat = pq_compute_single_image(gt, gt_segs, pr, pr_segs)
    iou, tp, fp, fn = stat.stats[(4, True)]
    assert (tp, fp, fn) == (1, 0, 0)
    assert iou == pytest.approx(1.0)


def test_pq_stat_merge_and_missing_image():
    a, b = PQStat(), PQStat()
    a.stats[(0, True)][1] = 1
    a.stats[(0, True)][0] = 0.9
    b.stats[(0, True)][2] = 1
    a += b
    assert a.stats[(0, True)][:3] == [0.9, 1, 1]

    ev = COCOPanopticEvaluator("synth")
    gt = np.ones((4, 4), np.int32)
    ev.process_gt("only_gt", gt, [_seg(1, 0, True)])
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == 0.0 and res["RQ"] == 0.0


def test_panoptic_inference_loop_e2e():
    """PanopticFPN inference -> host combine -> PQ evaluator end-to-end."""
    import jax
    import jax.numpy as jnp

    from cddmsl_tpu.evaluation.panoptic_eval import inference_on_dataset_panoptic
    from __graft_entry__ import _synthetic_batch

    from cddmsl_tpu.models.panoptic_fpn import PanopticFPN
    from cddmsl_tpu.utils.testing import materialize_params

    model = PanopticFPN(num_classes=3, sem_seg_classes=5, depth=10)
    batch = _synthetic_batch(1, 64, 64, g=2)
    r = np.random.RandomState(0)
    sem_gt = jnp.asarray(r.randint(0, 5, (1, 64, 64)), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r_, bb: model.init({"params": r_}, bb, sem_gt, r_), rng, batch
    )

    gt_map = np.zeros((64, 64), np.int32)
    gt_map[:32] = 1
    gt_map[32:] = 2
    meta = {
        "image_id": 7,
        "pan_seg_ids": gt_map,
        "segments_info": [_seg(1, 0, True), _seg(2, 1, False)],
    }

    def infer(params_, batch_):
        return model.apply(params_, batch_, method=model.inference)

    ev = COCOPanopticEvaluator("synth")
    res = inference_on_dataset_panoptic(infer, params, [(batch, [meta])], ev)
    pan = res["panoptic_seg"]
    assert set(pan) == {"PQ", "SQ", "RQ", "PQ_th", "SQ_th", "RQ_th", "PQ_st", "SQ_st", "RQ_st"}
    assert all(np.isfinite(v) for v in pan.values())


# ---------------- rotated COCO evaluator ----------------


def _xywha_from_xyxy(b):
    x0, y0, x1, y1 = b
    return [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0, 0.0]


def test_rotated_evaluator_matches_axis_aligned():
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator
    from cddmsl_tpu.evaluation.rotated_coco_eval import RotatedCOCOEvaluator

    MetadataCatalog.get("rot_synth").set(thing_classes=["a", "b"])
    r = np.random.RandomState(3)
    plain = COCOEvaluator("rot_synth")
    rot = RotatedCOCOEvaluator("rot_synth")
    for img in range(3):
        # sort the two corners per coordinate -> [x0, y0, x1, y1] valid XYXY
        g = np.sort(r.rand(4, 2, 2) * 100, axis=1).transpose(0, 2, 1).reshape(4, 4)
        g = g[:, [0, 2, 1, 3]]
        gc = r.randint(0, 2, 4)
        d = g + r.randn(4, 4) * 3
        d[:, 2:] = np.maximum(d[:, 2:], d[:, :2] + 1)
        ds = r.rand(4)
        plain.process(img, d, ds, gc)
        plain.process_gt(img, g, gc)
        rot.process(img, np.array([_xywha_from_xyxy(b) for b in d]), ds, gc)
        rot.process_gt(img, np.array([_xywha_from_xyxy(b) for b in g]), gc)
    ap_plain = plain.evaluate()["bbox"]
    ap_rot = rot.evaluate()["bbox"]
    for k in ("AP", "AP50", "AP75"):
        assert ap_rot[k] == pytest.approx(ap_plain[k], abs=1e-4), k


def test_rotated_evaluator_angle_sensitivity():
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.rotated_coco_eval import RotatedCOCOEvaluator

    MetadataCatalog.get("rot_synth2").set(thing_classes=["a"])
    ev = RotatedCOCOEvaluator("rot_synth2")
    gt = np.array([[50.0, 50.0, 40.0, 10.0, 45.0]])
    ev.process_gt(0, gt, np.array([0]))
    # perfect rotated match -> AP 100
    ev.process(0, gt.copy(), np.array([0.9]), np.array([0]))
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0)

    # orthogonal thin box over the same center: IoU well below 0.5 -> AP 0
    ev2 = RotatedCOCOEvaluator("rot_synth2")
    ev2.process_gt(0, gt, np.array([0]))
    det = gt.copy()
    det[0, 4] = 135.0
    ev2.process(0, det, np.array([0.9]), np.array([0]))
    assert ev2.evaluate()["bbox"]["AP"] == pytest.approx(0.0)


# ---------------- OVD zero-shot splits ----------------


def test_ovd_split_metrics():
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.data.datasets.coco_zeroshot_categories import (
        COCO_OVD_ALL_CLS,
        COCO_SEEN_CLS,
        COCO_UNSEEN_CLS,
    )
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator

    MetadataCatalog.get("ovd_synth").set(thing_classes=list(COCO_OVD_ALL_CLS))
    ev = COCOEvaluator("ovd_synth")
    person = COCO_OVD_ALL_CLS.index("person")  # seen
    airplane = COCO_OVD_ALL_CLS.index("airplane")  # unseen
    g = np.array([[10, 10, 50, 50], [60, 60, 90, 90.0]])
    ev.process_gt(0, g, np.array([person, airplane]))
    # perfect detection for the seen class only
    ev.process(0, g[:1], np.array([0.9]), np.array([person]))
    res = ev.evaluate()["bbox"]
    assert res["AP50_split_base"] == pytest.approx(100.0)
    assert res["AP50_split_target"] == pytest.approx(0.0)
    assert res["AP50_split_all"] == pytest.approx(50.0)

    # a 20-class evaluator reports no split keys
    MetadataCatalog.get("ovd_synth20").set(thing_classes=[f"c{i}" for i in range(20)])
    ev20 = COCOEvaluator("ovd_synth20")
    ev20.process_gt(0, g[:1], np.array([0]))
    ev20.process(0, g[:1], np.array([0.9]), np.array([0]))
    assert not any(k.startswith("AP50_split") for k in ev20.evaluate()["bbox"])


def test_ovd_registrations_present():
    from cddmsl_tpu.data.catalog import DatasetCatalog
    from cddmsl_tpu.data.datasets.builtin import register_all

    register_all()
    for name in (
        "coco_2017_ovd_all_train", "coco_2017_ovd_b_train", "coco_2017_ovd_t_train",
        "coco_2017_ovd_all_test", "coco_2017_ovd_b_test", "coco_2017_ovd_t_test",
        "coco_2017_train_panoptic", "coco_2017_val_panoptic",
    ):
        assert name in DatasetCatalog.list(), name


def test_keypoints_task_with_classwise_empty_gt():
    """Regression: a class with detections but no GT in an image (or vice
    versa) must not crash the keypoints task (np.stack on an empty list)."""
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator

    MetadataCatalog.get("kp_empty_synth").set(
        thing_classes=["a", "b"], keypoint_oks_sigmas=(0.1, 0.1, 0.1)
    )
    ev = COCOEvaluator("kp_empty_synth", tasks=("bbox", "keypoints"))
    box = np.array([[10.0, 10.0, 50.0, 50.0]])
    kps = np.array([[[20.0, 20.0, 2], [30, 30, 2], [40, 40, 2]]])
    # GT only for class 0; detections for BOTH classes
    ev.process_gt(0, box, np.array([0]), keypoints=kps)
    ev.process(0, np.concatenate([box, box]), np.array([0.9, 0.8]),
               np.array([0, 1]), keypoints=np.concatenate([kps, kps]))
    res = ev.evaluate()["keypoints"]
    assert np.isfinite(res["AP"])
    assert res["AP"] == pytest.approx(100.0)  # class-0 det matches perfectly
