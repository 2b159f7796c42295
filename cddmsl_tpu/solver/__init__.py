from .build import build_lr_schedule, build_optimizer, path_is_frozen, trainable_mask

__all__ = ["build_lr_schedule", "build_optimizer", "path_is_frozen", "trainable_mask"]
