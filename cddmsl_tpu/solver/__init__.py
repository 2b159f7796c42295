from .build import (
    build_lr_schedule,
    build_optimizer,
    default_X_scheduler,
    multistep_schedule,
    path_is_frozen,
    sgd,
    trainable_mask,
)

__all__ = [
    "build_lr_schedule",
    "build_optimizer",
    "default_X_scheduler",
    "multistep_schedule",
    "path_is_frozen",
    "sgd",
    "trainable_mask",
]
