"""Full-stack integration: synthetic on-disk VOC dataset -> DefaultTrainer
train + eval through the public API (config tree, loaders, jitted step,
checkpointer, evaluator). The CPU analogue of a quick_schedules instant test."""

import os

import numpy as np
import pytest
from PIL import Image

from cddmsl_tpu.config import add_ateacher_config, get_cfg
from cddmsl_tpu.data import DatasetCatalog
from cddmsl_tpu.data.datasets.voc import register_pascal_DG, register_pascal_voc


def _make_voc(root, n=6, seed=0):
    rng = np.random.RandomState(seed)
    voc = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(voc, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(voc, "ImageSets", "Main"), exist_ok=True)
    dt = os.path.join(root, "dt_clipart", "VOC2007", "JPEGImages")
    os.makedirs(dt, exist_ok=True)
    ids = []
    for i in range(n):
        fid = f"{i:06d}"
        ids.append(fid)
        h, w = 100, 140
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(voc, "JPEGImages", fid + ".jpg"))
        Image.fromarray(255 - img).save(os.path.join(dt, fid + ".jpg"))
        xml = f"""<annotation><size><width>{w}</width><height>{h}</height></size>
<object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>10</xmin><ymin>20</ymin><xmax>60</xmax><ymax>80</ymax></bndbox></object></annotation>"""
        with open(os.path.join(voc, "Annotations", fid + ".xml"), "w") as f:
            f.write(xml)
    for split in ("trainval", "test"):
        with open(os.path.join(voc, "ImageSets", "Main", split + ".txt"), "w") as f:
            f.write("\n".join(ids))
    return voc


@pytest.mark.slow
def test_default_trainer_end_to_end(tmp_path):
    voc = _make_voc(str(tmp_path))
    register_pascal_DG("itest_voc_dg", voc, "trainval", 2007, "dt_clipart")
    register_pascal_voc("itest_voc_test", voc, "test", 2007)
    try:
        cfg = get_cfg()
        add_ateacher_config(cfg)
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.DATASETS.TRAIN = ("itest_voc_dg",)
        cfg.DATASETS.TEST = ("itest_voc_test",)
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 20
        cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER = True
        cfg.MODEL.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
        cfg.MODEL.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
        cfg.INPUT.MIN_SIZE_TRAIN = (96,)
        cfg.INPUT.MAX_SIZE_TRAIN = 160
        cfg.INPUT.MIN_SIZE_TEST = 96
        cfg.INPUT.MAX_SIZE_TEST = 160
        cfg.INPUT.FORMAT = "RGB"
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.SOLVER.MAX_ITER = 3
        cfg.SOLVER.CHECKPOINT_PERIOD = 0
        cfg.SOLVER.CAPTION_BURNUP_ITERS = 1  # exercise caption branches at iter 2-3
        cfg.TEST.EVAL_PERIOD = 0
        cfg.TPU.PAD_SIZE_TRAIN = [96, 160]
        cfg.TPU.PAD_SIZE_TEST = [96, 160]
        cfg.TPU.MAX_GT_BOXES = 10
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
        cfg.TPU.REGION_CONSISTENCY_BOXES = 4
        cfg.TPU.MESH_SHAPE = [1]
        # compile-light network + structure-only init: this test exercises
        # the TRAINER stack (loaders/step/checkpoint/eval), not RN50 depth
        cfg.TPU.BACKBONE_LAYERS = [1, 1, 1, 1]
        cfg.TPU.BACKBONE_WIDTH = 16
        cfg.TPU.EMBED_DIM = 128
        cfg.TPU.V2L_MAPPER_LAYERS = 2
        cfg.TPU.V2L_MAPPER_TOKENS = 8
        cfg.TPU.REMAT_BACKBONE = False
        cfg.TPU.FAST_INIT = True

        from cddmsl_tpu.engine.defaults import DefaultTrainer

        trainer = DefaultTrainer(cfg)
        trainer.resume_or_load(resume=False)
        results = trainer.train()
        # final checkpoint written
        assert trainer.checkpointer.has_checkpoint()
        # eval ran over the test set and produced the VOC metric dict
        assert "itest_voc_test" in results
        assert "bbox" in results["itest_voc_test"]
        assert "AP50" in results["itest_voc_test"]["bbox"]
        # metrics.json written
        assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

        # resume path: a fresh trainer restores the final checkpoint
        trainer2 = DefaultTrainer(cfg)
        trainer2.resume_or_load(resume=True)
        assert int(trainer2.start_iter) == 3
    finally:
        DatasetCatalog.remove("itest_voc_dg")
        DatasetCatalog.remove("itest_voc_test")
