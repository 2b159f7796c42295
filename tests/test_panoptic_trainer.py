"""PanopticFPN through the full public API: synthetic on-disk COCO-panoptic
dataset -> DefaultTrainer train (instance + sem-seg losses from the panoptic
PNG via PanopticDatasetMapper + DetBatch.sem_seg) -> test() -> PQ/SQ/RQ from
the native panoptic evaluator (reference train_net.py Trainer + panoptic
evaluator flow)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cddmsl_tpu.data.catalog import DatasetCatalog, MetadataCatalog


def _make_panoptic_dataset(root, n=4, h=64, w=96, seed=0):
    """COCO-panoptic layout: images + id-encoded PNGs + panoptic json.
    Two thing categories (1, 2) + one stuff (100)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "imgs")
    pan_dir = os.path.join(root, "pan")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pan_dir, exist_ok=True)
    images, anns = [], []
    for i in range(n):
        fid = f"{i:06d}"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, fid + ".jpg"))
        # panoptic ids: 1 = a thing box, 2 = stuff everywhere else
        ids = np.full((h, w), 2, np.int32)
        x0, y0 = 8 + (i % 2) * 10, 8
        ids[y0 : y0 + 24, x0 : x0 + 32] = 1
        png = np.stack([ids % 256, ids // 256, ids // 65536], axis=-1).astype(np.uint8)
        Image.fromarray(png).save(os.path.join(pan_dir, fid + ".png"))
        images.append({"id": i, "height": h, "width": w, "file_name": fid + ".jpg"})
        anns.append(
            {
                "image_id": i,
                "file_name": fid + ".png",
                "segments_info": [
                    {"id": 1, "category_id": 1 + (i % 2), "iscrowd": 0,
                     "bbox": [x0, y0, 32, 24], "area": 32 * 24},
                    {"id": 2, "category_id": 100, "iscrowd": 0,
                     "bbox": [0, 0, w, h], "area": h * w - 32 * 24},
                ],
            }
        )
    j = {
        "categories": [
            {"id": 1, "name": "thing_a", "isthing": 1},
            {"id": 2, "name": "thing_b", "isthing": 1},
            {"id": 100, "name": "stuff_x", "isthing": 0},
        ],
        "images": images,
        "annotations": anns,
    }
    json_path = os.path.join(root, "pan.json")
    with open(json_path, "w") as f:
        json.dump(j, f)
    return json_path, img_dir, pan_dir


@pytest.mark.slow
def test_panoptic_fpn_trainer_end_to_end(tmp_path):
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.datasets.coco_panoptic import register_coco_panoptic
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    json_path, img_dir, pan_dir = _make_panoptic_dataset(str(tmp_path))
    name = "_pan_trainer_fixture"
    register_coco_panoptic(name, json_path, img_dir, pan_dir)
    try:
        cfg = get_cfg()
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
        cfg.MODEL.RESNETS.DEPTH = 10
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 3  # stuff space covers all cats
        cfg.MODEL.PIXEL_MEAN = [103.53, 116.28, 123.675]
        cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
        cfg.INPUT.MIN_SIZE_TRAIN = (64,)
        cfg.INPUT.MAX_SIZE_TRAIN = 96
        cfg.INPUT.MIN_SIZE_TEST = 64
        cfg.INPUT.MAX_SIZE_TEST = 96
        cfg.INPUT.FORMAT = "BGR"
        cfg.DATASETS.TRAIN = (name,)
        cfg.DATASETS.TEST = (name,)
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.SOLVER.MAX_ITER = 2
        cfg.SOLVER.CHECKPOINT_PERIOD = 0
        cfg.SOLVER.BASE_LR = 0.001
        cfg.TEST.EVAL_PERIOD = 0
        cfg.TPU.PAD_SIZE_TRAIN = [64, 96]
        cfg.TPU.PAD_SIZE_TEST = [64, 96]
        cfg.TPU.MAX_GT_BOXES = 8
        cfg.TPU.MESH_SHAPE = [1]
        cfg.MODEL.CLIP.IMS_PER_BATCH_TEST = 2
        cfg.TPU.ENABLE_CAPTION_CONSISTENCY = False
        cfg.freeze()

        trainer = DefaultTrainer(cfg)
        results = trainer.train()
        # sem-seg loss flowed through the step
        hist = trainer.storage.histories()
        assert "loss_sem_seg" in hist
        assert np.isfinite(hist["loss_sem_seg"].latest())
        pan = results[name]["panoptic_seg"]
        for k in ("PQ", "SQ", "RQ", "PQ_th", "PQ_st"):
            assert k in pan and np.isfinite(pan[k]), k
    finally:
        DatasetCatalog.remove(name)


def test_panoptic_train_loader_batch(tmp_path):
    """The train loader auto-selects the panoptic mapper and collates
    DetBatch.sem_seg (255-padded)."""
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.build import build_detection_train_loader, stop_all_prefetchers
    from cddmsl_tpu.data.datasets.coco_panoptic import register_coco_panoptic

    json_path, img_dir, pan_dir = _make_panoptic_dataset(str(tmp_path))
    name = "_pan_loader_fixture"
    register_coco_panoptic(name, json_path, img_dir, pan_dir)
    try:
        cfg = get_cfg()
        cfg.DATASETS.TRAIN = (name,)
        cfg.INPUT.MIN_SIZE_TRAIN = (64,)
        cfg.INPUT.MAX_SIZE_TRAIN = 96
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.TPU.PAD_SIZE_TRAIN = [64, 96]
        cfg.TPU.MAX_GT_BOXES = 8
        loader = build_detection_train_loader(cfg)
        batch = next(loader)
        assert batch.sem_seg is not None
        assert batch.sem_seg.shape == batch.image.shape[:3]
        vals = set(np.unique(np.asarray(batch.sem_seg)))
        # stuff-space classes (thing 0/1, stuff 2) + possibly 255 pad
        assert vals <= {0, 1, 2, 255}
        assert batch.gt_valid[:, 0].all()  # each image has its thing box
    finally:
        stop_all_prefetchers()
        DatasetCatalog.remove(name)
