"""End-to-end smoke of tools/visualize_test.py (the reference root scripts
visualize_test.py / visualize_test_city.py): DefaultPredictor over a
directory of images for each named model + VOC-XML ground-truth overlays.
Also the only e2e coverage of engine.defaults.DefaultPredictor itself."""

import glob
import importlib.util
import os
import sys

import numpy as np
import pytest


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "visualize_test.py")
    spec = importlib.util.spec_from_file_location("_visualize_test_tool", path)
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = [path]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old
    return mod


def test_visualize_test_end_to_end(tmp_path, monkeypatch):
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick

    register_synthetic_quick(str(tmp_path))
    voc = os.path.join(str(tmp_path), "VOC2007")
    out = os.path.join(str(tmp_path), "predictions")

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "quick_schedules", "rcnn_instant_test.yaml"
    )
    tool = _load_tool()
    monkeypatch.setattr(
        sys, "argv",
        [
            "visualize_test.py",
            "--config-file", cfg_path,
            "--input", os.path.join(voc, "JPEGImages"),
            "--model", "ours=",  # empty weights -> random init (smoke)
            "--dataset", "synthetic_voc_test",
            "--gt-xml-dir", os.path.join(voc, "Annotations"),
            "--score-thresh", "0.0",  # random init scores are tiny; draw anyway
            "--max-images", "2",
            "--output", out,
            "--tag", "syn",
        ],
    )
    tool.main()

    preds = sorted(glob.glob(os.path.join(out, "syn_ours", "*.jpg")))
    gts = sorted(glob.glob(os.path.join(out, "syn_GT", "*.jpg")))
    assert len(preds) == 2, preds
    assert len(gts) == 2, gts
    from PIL import Image

    # GT overlay must differ from the raw image (boxes actually drawn)
    raw = np.asarray(Image.open(os.path.join(voc, "JPEGImages", "000000.jpg")).convert("RGB"))
    drawn = np.asarray(Image.open(gts[0]).convert("RGB"))
    assert drawn.shape == raw.shape
    assert (drawn != raw).any()


def test_parse_voc_xml(tmp_path):
    tool = _load_tool()
    xml = tmp_path / "x.xml"
    xml.write_text(
        "<annotation><object><name>cat</name>"
        "<bndbox><xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>"
        "</object><object><name>unknown</name>"
        "<bndbox><xmin>5</xmin><ymin>6</ymin><xmax>7</xmax><ymax>8</ymax></bndbox>"
        "</object></annotation>"
    )
    boxes, classes = tool._parse_voc_xml(str(xml), ["dog", "cat"])
    np.testing.assert_allclose(boxes, [[1, 2, 30, 40], [5, 6, 7, 8]])
    assert classes.tolist() == [1, 0]  # unknown name falls back to 0
