"""Reference-code-in-the-loop oracle for the VOC AP metric.

The DG headline numbers (BASELINE.md: mAP@50 on Clipart/Watercolor/Comic and
adverse-weather splits) are computed by the reference's voc_eval — the
py-faster-rcnn devkit port in evaluation/pascal_voc_evaluation.py:201-330.
This module runs that ACTUAL code (via tests/_reference_shim.py; det/anno
files synthesized on disk exactly as the reference evaluator writes them)
against our evaluation/pascal_voc.py voc_eval_class on identical
detections/GT, pinning rec/prec-derived AP under both the 07 11-point and
the 12 continuous metric, across IoU thresholds, with difficult objects and
duplicate detections in play.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from _reference_shim import build_ref_pkg  # noqa: E402


@pytest.fixture(scope="module")
def refmods():
    mods = build_ref_pkg()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


def _xml(image_id, objs):
    parts = ["<annotation>"]
    for name, (x1, y1, x2, y2), diff in objs:
        parts.append(
            f"<object><name>{name}</name><pose>Unspecified</pose>"
            f"<truncated>0</truncated><difficult>{int(diff)}</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
        )
    parts.append("</annotation>")
    return "".join(parts)


@pytest.mark.parametrize("use_07", [True, False])
@pytest.mark.parametrize("ovthresh", [0.5, 0.75])
def test_voc_ap_matches_reference(refmods, rng, tmp_path, use_07, ovthresh):
    from cddmsl_tpu.evaluation.pascal_voc import voc_eval_class

    classes = ["dog", "cat"]
    n_img = 8
    image_ids = [f"im{i:03d}" for i in range(n_img)]

    # GT: 0-3 boxes per image per class, ~20% difficult; integer 1-based
    # coords exactly as VOC XMLs carry them
    gt = {iid: [] for iid in image_ids}
    for iid in image_ids:
        for cls in classes:
            for _ in range(rng.randint(0, 4)):
                x1, y1 = rng.randint(1, 300), rng.randint(1, 200)
                w, h = rng.randint(20, 120), rng.randint(20, 120)
                gt[iid].append((cls, (x1, y1, x1 + w, y1 + h), rng.rand() < 0.2))

    # detections: jittered copies of GT (some duplicated -> duplicate
    # penalty), plus pure-noise false positives
    dets = {cls: [] for cls in classes}
    for iid in image_ids:
        for name, (x1, y1, x2, y2), _ in gt[iid]:
            for _ in range(rng.randint(1, 3)):  # 1-2 dets per gt: dups occur
                j = rng.randint(-8, 9, 4)
                dets[name].append(
                    (iid, float(rng.rand()), (x1 + j[0], y1 + j[1], x2 + j[2], y2 + j[3]))
                )
        for cls in classes:
            if rng.rand() < 0.5:
                x1, y1 = rng.randint(1, 300), rng.randint(1, 200)
                dets[cls].append(
                    (iid, float(rng.rand()), (x1, y1, x1 + rng.randint(10, 60), y1 + rng.randint(10, 60)))
                )

    # ---- reference side: files exactly as the d2 evaluator writes them ----
    anno_dir = tmp_path / "Annotations"
    anno_dir.mkdir()
    for iid in image_ids:
        (anno_dir / f"{iid}.xml").write_text(_xml(iid, gt[iid]))
    (tmp_path / "test.txt").write_text("\n".join(image_ids) + "\n")
    for cls in classes:
        lines = [
            f"{iid} {score:.6f} {b[0]:.1f} {b[1]:.1f} {b[2]:.1f} {b[3]:.1f}"
            for iid, score, b in dets[cls]
        ]
        (tmp_path / f"det_{cls}.txt").write_text("\n".join(lines) + "\n")

    for cls in classes:
        _, _, want_ap = refmods.pascal_voc.voc_eval(
            str(tmp_path / "det_{}.txt"),
            str(anno_dir / "{}.xml"),
            str(tmp_path / "test.txt"),
            cls,
            ovthresh=ovthresh,
            use_07_metric=use_07,
        )

        # ---- our side: same data as arrays ----
        our_dets = [
            {"image_id": iid, "score": score, "bbox": np.asarray(b, np.float32)}
            for iid, score, b in dets[cls]
        ]
        our_gt = {}
        for iid in image_ids:
            rows = [(b, d) for name, b, d in gt[iid] if name == cls]
            our_gt[iid] = {
                "boxes": np.asarray([r[0] for r in rows], np.float32).reshape(-1, 4),
                "difficult": np.asarray([r[1] for r in rows], bool),
            }
        got_ap = voc_eval_class(our_dets, our_gt, ovthresh=ovthresh, use_07_metric=use_07)
        assert 0.0 < want_ap < 1.0  # non-degenerate
        np.testing.assert_allclose(got_ap, want_ap, rtol=1e-8, atol=1e-10)
