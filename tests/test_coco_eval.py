import numpy as np
import pytest

from cddmsl_tpu.data.catalog import MetadataCatalog
from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator


@pytest.fixture
def evaluator():
    name = "_test_coco_eval_ds"
    meta = MetadataCatalog.get(name)
    if meta.get("thing_classes") is None:
        meta.set(thing_classes=["a", "b"])
    ev = COCOEvaluator(name)
    ev.reset()
    return ev


def test_perfect_detection(evaluator):
    gt = np.array([[10, 10, 60, 60.0]])
    evaluator.process_gt("i1", gt, np.array([0]))
    evaluator.process("i1", gt, np.array([0.9]), np.array([0]))
    res = evaluator.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0, abs=1e-6)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-6)
    assert res["AP75"] == pytest.approx(100.0, abs=1e-6)


def test_iou_062_matches_three_thresholds(evaluator):
    # det IoU with gt = 0.62 -> TP at t in {.5,.55,.6} only -> AP = 30
    gt = np.array([[0, 0, 100, 100.0]])
    det = np.array([[0, 0, 100, 62.0]])  # IoU = 0.62
    evaluator.process_gt("i1", gt, np.array([0]))
    evaluator.process("i1", det, np.array([0.9]), np.array([0]))
    res = evaluator.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(30.0, abs=0.5)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-6)
    assert res["AP75"] == pytest.approx(0.0, abs=1e-6)


def test_crowd_gt_ignored_not_fp(evaluator):
    # one real gt + one crowd gt; det on crowd region is neither TP nor FP
    evaluator.process_gt(
        "i1",
        np.array([[0, 0, 50, 50.0], [100, 100, 200, 200.0]]),
        np.array([0, 0]),
        iscrowd=np.array([False, True]),
    )
    evaluator.process(
        "i1",
        np.array([[0, 0, 50, 50.0], [100, 100, 200, 200.0]]),
        np.array([0.9, 0.8]),
        np.array([0, 0]),
    )
    res = evaluator.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0, abs=1e-6)


def test_false_positive_halves_precision(evaluator):
    gt = np.array([[10, 10, 60, 60.0]])
    evaluator.process_gt("i1", gt, np.array([0]))
    # one TP (lower score) + one FP (higher score): precision at recall 1 is 0.5
    evaluator.process(
        "i1",
        np.array([[200, 200, 250, 250.0], [10, 10, 60, 60.0]]),
        np.array([0.95, 0.9]),
        np.array([0, 0]),
    )
    res = evaluator.evaluate()["bbox"]
    assert res["AP50"] == pytest.approx(50.0, abs=1.0)


def test_area_splits(evaluator):
    # small gt (20x20=400 < 32^2) evaluated under APs, not APl
    gt = np.array([[0, 0, 20, 20.0]])
    evaluator.process_gt("i1", gt, np.array([0]))
    evaluator.process("i1", gt, np.array([0.9]), np.array([0]))
    res = evaluator.evaluate()["bbox"]
    assert res["APs"] == pytest.approx(100.0, abs=1e-6)
    assert np.isnan(res["APl"])


def test_native_matches_numpy_fallback(rng):
    """C++ kernel (csrc/cocoeval.cpp) vs the numpy implementation."""
    from unittest import mock

    import cddmsl_tpu.evaluation.coco_eval as ce

    dets = rng.rand(30, 4) * 100
    dets[:, 2:] += dets[:, :2] + 5
    scores = rng.rand(30)
    gts = rng.rand(10, 4) * 100
    gts[:, 2:] += gts[:, :2] + 5
    gt_ignore = rng.rand(10) > 0.7
    iscrowd = np.zeros(10, bool)
    th = ce.IOU_THRESHOLDS

    native = ce._eval_image(dets, scores, gts, gt_ignore, iscrowd, th)
    with mock.patch.object(ce, "_native_lib", lambda: None):
        ref = ce._eval_image(dets, scores, gts, gt_ignore, iscrowd, th)
    for a, b in zip(native, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prediction_dump(tmp_path):
    import json

    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.evaluation.coco_eval import COCOEvaluator

    name = "_dump_fixture"
    if MetadataCatalog.get(name).get("thing_classes") is None:
        MetadataCatalog.get(name).set(thing_classes=["a"], evaluator_type="coco")
    out = str(tmp_path / "preds.json")
    ev = COCOEvaluator(name, output_json=out)
    b = np.asarray([[10, 10, 50, 40.0]])
    ev.process_gt("img7", b, [0])
    ev.process("img7", b, [0.9], [0])
    ev.evaluate()
    recs = json.load(open(out))
    assert recs == [{"image_id": "img7", "category_id": 0,
                     "bbox": [10.0, 10.0, 40.0, 30.0], "score": 0.9}]
