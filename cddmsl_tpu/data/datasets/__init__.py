from .builtin import register_all
from .voc import (
    ARTISTIC_6_CLASSES,
    CLASS_NAMES,
    load_voc_DG_instances,
    load_voc_instances,
    register_pascal_DG,
    register_pascal_voc,
)
from .coco import load_coco_json, register_coco_instances
from .cityscapes import (
    CITYSCAPES_THING_CLASSES,
    load_cityscapes_DG_instances,
    load_cityscapes_instances,
    register_cityscapes,
    register_cityscapes_DG,
)

__all__ = [
    "register_all",
    "ARTISTIC_6_CLASSES",
    "CLASS_NAMES",
    "load_voc_DG_instances",
    "load_voc_instances",
    "register_pascal_DG",
    "register_pascal_voc",
    "load_coco_json",
    "register_coco_instances",
    "CITYSCAPES_THING_CLASSES",
    "load_cityscapes_DG_instances",
    "load_cityscapes_instances",
    "register_cityscapes",
    "register_cityscapes_DG",
]
