"""Config-name -> (config path, weights path) resolver (reference
detectron2/model_zoo/model_zoo.py:200). Weights URLs are not downloadable in
this environment; local checkpoint paths are resolved instead."""

import os
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CONFIG_PATH_TO_WEIGHTS = {
    "VOC-Experiments/faster_rcnn_CLIP_R_50_C4.yaml": "pretrained_ckpt/regionclip/regionclip_pretrained-cc_rn50.pth",
    "AdverseWeather-Experiments/faster_rcnn_CLIP_R_50_C4.yaml": "pretrained_ckpt/regionclip/regionclip_pretrained-cc_rn50.pth",
}


def get_config_file(config_path: str) -> str:
    path = os.path.join(_ROOT, "configs", config_path)
    if not os.path.exists(path):
        raise RuntimeError(f"{config_path} not available in configs/!")
    return path


def get_checkpoint_path(config_path: str) -> Optional[str]:
    rel = _CONFIG_PATH_TO_WEIGHTS.get(config_path)
    return os.path.join(_ROOT, rel) if rel else None


def get_config(config_path: str, trained: bool = False):
    from .config import add_ateacher_config, get_cfg

    cfg = get_cfg()
    add_ateacher_config(cfg)
    cfg.merge_from_file(get_config_file(config_path))
    if trained:
        w = get_checkpoint_path(config_path)
        if w:
            cfg.MODEL.WEIGHTS = w
    return cfg


def get(config_path: str, trained: bool = False):
    """Build the model for a zoo config (reference model_zoo.get)."""
    from .models import build_model

    return build_model(get_config(config_path, trained))
