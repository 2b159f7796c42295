"""Cityscapes panoptic loader (reference data/datasets/
cityscapes_panoptic.py:18-188) on a synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest


def _write_fixture(root):
    img_dir = os.path.join(root, "cityscapes", "leftImg8bit", "val", "frankfurt")
    gt_dir = os.path.join(root, "cityscapes", "gtFine", "cityscapes_panoptic_val")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    from PIL import Image

    base = "frankfurt_000000_000294"
    Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(
        os.path.join(img_dir, f"{base}_leftImg8bit.png")
    )
    pan_name = f"{base}_gtFine_panoptic.png"
    Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(os.path.join(gt_dir, pan_name))
    gt_json = os.path.join(root, "cityscapes", "gtFine", "cityscapes_panoptic_val.json")
    ann = {
        "image_id": base,
        "file_name": pan_name,
        "segments_info": [
            {"id": 26001, "category_id": 26, "iscrowd": 0, "area": 100},  # car (thing)
            {"id": 7, "category_id": 7, "iscrowd": 0, "area": 400},  # road (stuff)
        ],
    }
    with open(gt_json, "w") as f:
        json.dump({"annotations": [ann]}, f)
    return base


def test_load_cityscapes_panoptic(tmp_path):
    from cddmsl_tpu.data.datasets.cityscapes_panoptic import (
        cityscapes_panoptic_meta,
        load_cityscapes_panoptic,
    )

    root = str(tmp_path)
    base = _write_fixture(root)
    meta = cityscapes_panoptic_meta()
    assert meta["thing_dataset_id_to_contiguous_id"][26] == 13  # car trainId
    assert meta["stuff_dataset_id_to_contiguous_id"][7] == 0  # road trainId
    assert len(meta["thing_classes"]) == 19

    dicts = load_cityscapes_panoptic(
        os.path.join(root, "cityscapes", "leftImg8bit", "val"),
        os.path.join(root, "cityscapes", "gtFine", "cityscapes_panoptic_val"),
        os.path.join(root, "cityscapes", "gtFine", "cityscapes_panoptic_val.json"),
        meta,
    )
    assert len(dicts) == 1
    d = dicts[0]
    assert d["image_id"] == "frankfurt_000000_000294"
    assert os.path.isfile(d["file_name"])
    assert os.path.isfile(d["pan_seg_file_name"])
    assert d["sem_seg_file_name"].endswith("_labelTrainIds.png")
    car, road = d["segments_info"]
    assert car["category_id"] == 13 and car["isthing"] is True
    assert road["category_id"] == 0 and road["isthing"] is False

    # missing json raises the createPanopticImgs hint
    with pytest.raises(FileNotFoundError):
        load_cityscapes_panoptic("x", "y", os.path.join(root, "nope.json"), meta)


def test_cityscapes_panoptic_registered():
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from cddmsl_tpu.data.datasets.builtin import register_all
    from cddmsl_tpu.engine.defaults import build_evaluator
    from cddmsl_tpu.evaluation.panoptic_eval import COCOPanopticEvaluator

    register_all()
    for split in ("train", "val"):
        name = f"cityscapes_fine_panoptic_{split}"
        assert name in DatasetCatalog.list()
        meta = MetadataCatalog.get(name)
        assert meta.get("evaluator_type") == "cityscapes_panoptic_seg"
        assert meta.get("label_divisor") == 1000
    ev = build_evaluator(get_cfg(), "cityscapes_fine_panoptic_val")
    assert isinstance(ev, COCOPanopticEvaluator)
