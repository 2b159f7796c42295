"""config/compat.py version migration + visualizer depth (VERDICT round-2
item 10). Reference: detectron2/config/compat.py:229,
utils/visualizer.py:1219, utils/video_visualizer.py:235."""

import numpy as np
import pytest

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.config.cfg_node import CfgNode
from cddmsl_tpu.config.compat import downgrade_config, guess_version, upgrade_config


# ---------------- compat ----------------
def test_upgrade_downgrade_roundtrip():
    cfg = get_cfg()
    old = downgrade_config(cfg, to_version=0)
    assert old.VERSION == 0
    assert "RPN_HEAD" in old.MODEL  # V1 rename undone
    assert "ANCHOR_SIZES" in old.MODEL.RPN  # V2 rename undone
    back = upgrade_config(old)
    assert back.VERSION == cfg.VERSION
    assert back.MODEL.ANCHOR_GENERATOR.SIZES == cfg.MODEL.ANCHOR_GENERATOR.SIZES
    assert back.MODEL.RPN.HEAD_NAME == cfg.MODEL.RPN.HEAD_NAME


def test_guess_version():
    assert guess_version(CfgNode({"VERSION": 1})) == 1
    assert guess_version(CfgNode({"MODEL": CfgNode({"RPN_HEAD": CfgNode({"NAME": "X"})})})) == 1
    assert guess_version(CfgNode({"MODEL": CfgNode()})) == 2


def test_old_version_yaml_upgrades_on_merge(tmp_path):
    """A v1 yaml using the pre-rename anchor keys loads into the current
    config surface (reference config.py merge_from_file migration)."""
    p = tmp_path / "old.yaml"
    p.write_text(
        "VERSION: 1\n"
        "MODEL:\n"
        "  RPN:\n"
        "    ANCHOR_SIZES: [[16, 32]]\n"
        "    ANCHOR_ASPECT_RATIOS: [[1.0]]\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert list(cfg.MODEL.ANCHOR_GENERATOR.SIZES) in ([[16, 32]], [(16, 32)])
    assert cfg.VERSION == 2


# ---------------- visualizer ----------------
def test_visualizer_masks_keypoints_panoptic():
    from cddmsl_tpu.utils.visualizer import Visualizer

    img = np.zeros((40, 60, 3), np.uint8)
    mask = np.zeros((40, 60), np.float32)
    mask[5:20, 5:25] = 1.0
    kps = np.array([[[10, 10, 0.9], [20, 15, 0.9], [15, 18, 0.01]]])
    v = Visualizer(img)
    out = v.draw_instance_predictions(
        boxes=np.array([[5, 5, 25, 20.0]]),
        scores=np.array([0.9]),
        classes=np.array([1]),
        masks=mask[None],
        keypoints=kps,
    )
    arr = np.asarray(out)
    assert arr.shape == (40, 60, 3)
    assert arr[12, 15].sum() > 0  # mask overlay painted inside the box

    v2 = Visualizer(img)
    v2.draw_sem_seg(np.tile(np.arange(3, dtype=np.int32).repeat(20)[None, :60], (40, 1)))
    assert np.asarray(v2.get_output()).sum() > 0

    v3 = Visualizer(img)
    pan = np.zeros((40, 60), np.int32)
    pan[:, 30:] = 7
    v3.draw_panoptic_seg(pan, [{"id": 7, "isthing": True, "category_id": 1},
                               {"id": 0, "isthing": False, "category_id": 3}])
    out3 = np.asarray(v3.get_output())
    assert out3[:, 35:].sum() > 0


def test_visualizer_dataset_dict_with_polygons():
    from cddmsl_tpu.utils.visualizer import Visualizer

    v = Visualizer(np.zeros((50, 50, 3), np.uint8))
    out = v.draw_dataset_dict(
        {"annotations": [{"bbox": [5, 5, 30, 30], "category_id": 0,
                          "segmentation": [[5, 5, 30, 5, 30, 30]],
                          "keypoints": [10, 10, 2, 20, 20, 2]}]}
    )
    assert np.asarray(out).sum() > 0


def test_video_visualizer_keeps_colors_across_frames():
    from cddmsl_tpu.utils.visualizer import VideoVisualizer

    vv = VideoVisualizer()
    frame = np.zeros((40, 40, 3), np.uint8)
    vv.draw_instance_predictions(frame, np.array([[5, 5, 20, 20.0], [25, 25, 38, 38.0]]),
                                 classes=np.array([0, 1]))
    colors1 = list(vv._prev_colors)
    # same instances moved slightly: colors must persist (IoU match)
    vv.draw_instance_predictions(frame, np.array([[6, 6, 21, 21.0], [24, 24, 37, 37.0]]),
                                 classes=np.array([0, 1]))
    assert vv._prev_colors == colors1
    # a NEW instance gets a new color
    vv.draw_instance_predictions(frame, np.array([[6, 6, 21, 21.0]]), classes=np.array([5]))
    assert vv._prev_colors[0] not in colors1
