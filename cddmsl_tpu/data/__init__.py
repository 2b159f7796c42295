from .catalog import DatasetCatalog, MetadataCatalog
from .build import (
    build_detection_test_loader,
    build_detection_train_loader,
    build_semisup_train_loader_two_crops,
    divide_label_unlabel,
    get_detection_dataset_dicts,
    build_lazy_test_loader,
    build_lazy_train_loader,
    pad_and_collate,
)
from .dataset_mapper import DatasetMapper, DatasetMapperTwoCropSeparate, read_image
from .datasets.builtin import register_all

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "build_detection_test_loader",
    "build_detection_train_loader",
    "build_semisup_train_loader_two_crops",
    "divide_label_unlabel",
    "get_detection_dataset_dicts",
    "build_lazy_test_loader",
    "build_lazy_train_loader",
    "pad_and_collate",
    "DatasetMapper",
    "DatasetMapperTwoCropSeparate",
    "read_image",
    "register_all",
]
