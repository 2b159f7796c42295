import os

import pytest

from cddmsl_tpu.config import CfgNode, add_ateacher_config, get_cfg


def test_defaults_present():
    cfg = get_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert cfg.MODEL.CLIP.CLSS_TEMP == 0.01
    assert cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN == 2000
    assert cfg.MODEL.KD_REGULRAZIATION is True  # reference defaults.py:30
    assert cfg.TPU.MESH_AXES == ("data",) or list(cfg.TPU.MESH_AXES) == ["data"]


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.ROI_HEADS.NUM_CLASSES", "20"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 20


def test_merge_from_list_bad_key():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOPE.KEY", "1"])


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "MODEL:\n  ROI_HEADS:\n    NUM_CLASSES: 80\n  RPN:\n    NMS_THRESH: 0.7\nSOLVER:\n  BASE_LR: 0.01\n"
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        f"_BASE_: base.yaml\nMODEL:\n  ROI_HEADS:\n    NUM_CLASSES: 20\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.ROI_HEADS.NUM_CLASSES == 20
    assert cfg.MODEL.RPN.NMS_THRESH == 0.7
    assert cfg.SOLVER.BASE_LR == 0.01


def test_base_typo_tolerated(tmp_path):
    # the reference AdverseWeather config has `BASE_:` instead of `_BASE_:`
    # (SURVEY.md §2.1); we implement the intended behavior.
    base = tmp_path / "base.yaml"
    base.write_text("SOLVER:\n  BASE_LR: 0.5\n")
    child = tmp_path / "child.yaml"
    child.write_text("BASE_: base.yaml\nSOLVER:\n  MAX_ITER: 5\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.SOLVER.BASE_LR == 0.5
    assert cfg.SOLVER.MAX_ITER == 5


def test_dump_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.123
    p = tmp_path / "dump.yaml"
    cfg.dump_to_file(str(p))
    cfg2 = get_cfg()
    cfg2.merge_from_file(str(p))
    assert cfg2.SOLVER.BASE_LR == 0.123


def test_ateacher_config():
    cfg = get_cfg()
    add_ateacher_config(cfg)
    assert cfg.SEMISUPNET.BBOX_THRESHOLD == 0.8
    assert cfg.SEMISUPNET.BURN_UP_STEP == 12000
    assert cfg.SEMISUPNET.EMA_KEEP_RATE == 0.9996
    assert cfg.DATALOADER.SUP_PERCENT == 100.0


def test_clone_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 99.0
    assert cfg.SOLVER.BASE_LR != 99.0
