from .checkpointer import DetectionCheckpointer
from .convert_torch import (
    convert_box_predictor,
    convert_clip_text,
    convert_clip_visual,
    convert_clipcap_mapper,
    convert_rpn_head,
    detect_dialect,
    load_clipcap_mapper,
    load_offline_backbone,
    load_rcnn_weights,
    load_text_emb_classifier,
    load_torch_state_dict,
)

__all__ = [
    "DetectionCheckpointer",
    "convert_box_predictor",
    "convert_clip_text",
    "convert_clip_visual",
    "convert_clipcap_mapper",
    "convert_rpn_head",
    "detect_dialect",
    "load_clipcap_mapper",
    "load_offline_backbone",
    "load_rcnn_weights",
    "load_text_emb_classifier",
    "load_torch_state_dict",
]
