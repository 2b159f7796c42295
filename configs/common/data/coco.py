# COCO dataloader fragment (reference configs/common/data/coco.py):
# standard ResizeShortestEdge/RandomFlip training pipeline over
# coco_2017_train/val. Swap `dataset` names or `augmentations` per recipe
# (the new_baselines LSJ recipes override augmentations with
# ResizeScale + FixedSizeCrop + RandomFlip).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.data import build_lazy_test_loader, build_lazy_train_loader

dataloader = dict(
    train=L(build_lazy_train_loader)(
        dataset="coco_2017_train",
        batch_size=16,
        min_size=(640, 672, 704, 736, 768, 800),
        max_size=1333,
        pad_hw=(800, 1344),
        mask_on=True,
    ),
    test=L(build_lazy_test_loader)(
        dataset="coco_2017_val",
        min_size=800,
        max_size=1333,
        pad_hw=(800, 1344),
    ),
    evaluator_dataset="coco_2017_val",
)
