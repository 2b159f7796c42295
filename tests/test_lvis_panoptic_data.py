"""LVIS + COCO-panoptic dataset loaders (VERDICT round-1 missing #10)."""

import json
import os

import numpy as np
import pytest


def test_lvis_loader(tmp_path):
    from cddmsl_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from cddmsl_tpu.data.datasets.lvis import load_lvis_json, register_lvis_instances

    j = {
        "categories": [
            {"id": 7, "name": "cat_a", "image_count": 5},
            {"id": 3, "name": "cat_b", "image_count": 500},
        ],
        "images": [
            {"id": 1, "height": 20, "width": 30,
             "coco_url": "http://images.cocodataset.org/val2017/000001.jpg",
             "neg_category_ids": [7], "not_exhaustive_category_ids": [3]},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 3, "bbox": [2, 3, 10, 8],
             "segmentation": [[2, 3, 12, 3, 12, 11, 2, 11]], "area": 80},
        ],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(j))
    name = "_lvis_fixture"
    register_lvis_instances(name, str(p), str(tmp_path))
    try:
        dicts = DatasetCatalog.get(name)
        assert len(dicts) == 1
        d = dicts[0]
        assert d["file_name"].endswith("val2017/000001.jpg")
        # category ids remapped by sorted original id: 3 -> 0, 7 -> 1
        assert d["annotations"][0]["category_id"] == 0
        assert d["annotations"][0]["bbox"] == [2, 3, 12, 11]
        assert d["neg_category_ids"] == [1]
        assert d["not_exhaustive_category_ids"] == [0]
        meta = MetadataCatalog.get(name)
        assert meta.get("class_image_counts") == [500, 5]
        assert meta.get("evaluator_type") == "lvis"
    finally:
        DatasetCatalog.remove(name)


def test_panoptic_loader_and_sem_seg(tmp_path):
    from PIL import Image

    from cddmsl_tpu.data.catalog import DatasetCatalog
    from cddmsl_tpu.data.datasets.coco_panoptic import (
        load_coco_panoptic_json,
        panoptic_png_to_sem_seg,
        register_coco_panoptic,
        rgb2id,
    )

    # panoptic png: two segments with ids 5 and 300
    png = np.zeros((10, 12, 3), np.uint8)
    png[:5] = [5, 0, 0]          # id 5
    png[5:] = [44, 1, 0]         # id 44 + 256 = 300
    Image.fromarray(png).save(tmp_path / "000001.png")
    Image.fromarray(np.zeros((10, 12, 3), np.uint8)).save(tmp_path / "000001.jpg")
    assert rgb2id(png)[0, 0] == 5 and rgb2id(png)[9, 0] == 300

    j = {
        "categories": [
            {"id": 1, "name": "person", "isthing": 1},
            {"id": 100, "name": "sky", "isthing": 0},
        ],
        "images": [{"id": 1, "height": 10, "width": 12, "file_name": "000001.jpg"}],
        "annotations": [
            {"image_id": 1, "file_name": "000001.png", "segments_info": [
                {"id": 5, "category_id": 1, "iscrowd": 0, "bbox": [0, 0, 12, 5], "area": 60},
                {"id": 300, "category_id": 100, "iscrowd": 0, "bbox": [0, 5, 12, 5], "area": 60},
            ]},
        ],
    }
    p = tmp_path / "pan.json"
    p.write_text(json.dumps(j))
    name = "_pan_fixture"
    register_coco_panoptic(name, str(p), str(tmp_path), str(tmp_path))
    try:
        dicts = DatasetCatalog.get(name)
        assert len(dicts) == 1
        segs = dicts[0]["segments_info"]
        assert segs[0]["isthing"] and not segs[1]["isthing"]
        sem = panoptic_png_to_sem_seg(png, segs)
        # stuff 'sky' is contiguous stuff id 1 (sorted by original id: 1->0, 100->1)
        assert (sem[5:] == 1).all()
    finally:
        DatasetCatalog.remove(name)


def test_panoptic_mapper(tmp_path):
    import json

    from PIL import Image

    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.dataset_mapper import PanopticDatasetMapper

    png = np.zeros((40, 60, 3), np.uint8)
    png[:20] = [5, 0, 0]
    png[20:] = [44, 1, 0]
    Image.fromarray(png).save(tmp_path / "im.png")
    Image.fromarray((np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)).save(
        tmp_path / "im.jpg"
    )
    d = {
        "file_name": str(tmp_path / "im.jpg"),
        "pan_seg_file_name": str(tmp_path / "im.png"),
        "image_id": 1,
        "height": 40,
        "width": 60,
        "segments_info": [
            {"id": 5, "category_id": 0, "isthing": True, "iscrowd": 0,
             "bbox": [5, 2, 30, 15], "area": 450},
            {"id": 300, "category_id": 1, "isthing": False, "iscrowd": 0,
             "bbox": None, "area": 1200},
        ],
    }
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (80,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    mapper = PanopticDatasetMapper(cfg, is_train=True)
    s = mapper(d, np.random.RandomState(0))
    assert s["sem_seg"].shape == s["image"].shape[:2]
    # nearest resampling preserves the label set exactly
    assert set(np.unique(s["sem_seg"])) <= {0, 1}
    assert len(s["boxes"]) == 1  # only the thing segment carries a box
    scale = s["image"].shape[0] / 40
    np.testing.assert_allclose(s["boxes"][0], np.asarray([5, 2, 35, 17]) * scale, rtol=1e-5)
