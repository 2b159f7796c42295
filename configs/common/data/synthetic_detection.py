# Dataloader recipe over the deterministic synthetic fixture (the reference
# configs/common/data/coco.py pattern: explicit-args loader LazyCalls; real
# COCO is not on disk in this environment — swap `dataset` for a registered
# COCO name to train on it).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.data import build_lazy_test_loader, build_lazy_train_loader

dataloader = dict(
    train=L(build_lazy_train_loader)(
        dataset="synthetic_voc_trainval_plain",
        batch_size=2,
        min_size=(96,),
        max_size=160,
        pad_hw=(96, 144),
    ),
    test=L(build_lazy_test_loader)(
        dataset="synthetic_voc_test",
        min_size=96,
        max_size=160,
        pad_hw=(96, 144),
    ),
    evaluator_dataset="synthetic_voc_test",
)
