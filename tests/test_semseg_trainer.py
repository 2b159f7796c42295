"""SemanticSegmentor through the full public API: synthetic on-disk
cityscapes-layout sem-seg dataset -> DefaultTrainer train (per-pixel CE from
DetBatch.sem_seg via SemSegDatasetMapper) -> test() -> mIoU/fwIoU/mACC/pACC
from SemSegEvaluator against the labelTrainIds PNGs (reference
semantic_seg.py + sem_seg_evaluation.py flow)."""

import os

import numpy as np
import pytest
from PIL import Image

from cddmsl_tpu.data.catalog import DatasetCatalog


def _make_semseg_dataset(root, n=4, h=64, w=96, n_cls=5, seed=0):
    """cityscapes layout: leftImg8bit/<split>/<city>/*_leftImg8bit.png +
    gtFine/<split>/<city>/*_gtFine_labelTrainIds.png."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "leftImg8bit", "val", "cityA")
    gt_dir = os.path.join(root, "gtFine", "val", "cityA")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        base = f"cityA_{i:06d}_000019"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, base + "_leftImg8bit.png"))
        gt = np.zeros((h, w), np.uint8)
        for c in range(1, n_cls):
            gt[:, c * (w // n_cls) : (c + 1) * (w // n_cls)] = c
        gt[:4] = 255  # ignore band
        Image.fromarray(gt).save(os.path.join(gt_dir, base + "_gtFine_labelTrainIds.png"))
    return os.path.join(root, "leftImg8bit", "val"), os.path.join(root, "gtFine", "val")


def _register(tmp_path, name, n_cls=5):
    from cddmsl_tpu.data.catalog import MetadataCatalog
    from cddmsl_tpu.data.datasets.cityscapes import load_cityscapes_semantic

    img_dir, gt_dir = _make_semseg_dataset(str(tmp_path), n_cls=n_cls)
    DatasetCatalog.register(name, lambda: load_cityscapes_semantic(img_dir, gt_dir))
    # synthetic fixture uses n_cls classes, not the 19 cityscapes ones
    MetadataCatalog.get(name).set(
        stuff_classes=[f"s{i}" for i in range(n_cls)],
        ignore_label=255,
        evaluator_type="sem_seg",
    )
    return img_dir, gt_dir


def test_load_cityscapes_semantic(tmp_path):
    from cddmsl_tpu.data.datasets.cityscapes import load_cityscapes_semantic

    img_dir, gt_dir = _make_semseg_dataset(str(tmp_path))
    dicts = load_cityscapes_semantic(img_dir, gt_dir)
    assert len(dicts) == 4
    d = dicts[0]
    assert os.path.isfile(d["file_name"]) and os.path.isfile(d["sem_seg_file_name"])
    assert d["sem_seg_file_name"].endswith("_gtFine_labelTrainIds.png")
    assert "annotations" not in d


@pytest.mark.slow
def test_semantic_segmentor_trainer_end_to_end(tmp_path):
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    name = "_semseg_trainer_fixture"
    _register(tmp_path, name)
    try:
        cfg = get_cfg()
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
        cfg.MODEL.RESNETS.DEPTH = 10
        cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
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
        cfg.TPU.MESH_SHAPE = [1]
        cfg.MODEL.CLIP.IMS_PER_BATCH_TEST = 2
        cfg.TPU.ENABLE_CAPTION_CONSISTENCY = False
        cfg.freeze()

        trainer = DefaultTrainer(cfg)
        results = trainer.train()
        hist = trainer.storage.histories()
        assert "loss_sem_seg" in hist and np.isfinite(hist["loss_sem_seg"].latest())
        res = results[name]["sem_seg"]
        for k in ("mIoU", "fwIoU", "mACC", "pACC"):
            assert k in res and np.isfinite(res[k]), k
        # predictions are near-random but scoring is real: pACC in (0, 100]
        assert 0.0 <= res["pACC"] <= 100.0
    finally:
        DatasetCatalog.remove(name)
