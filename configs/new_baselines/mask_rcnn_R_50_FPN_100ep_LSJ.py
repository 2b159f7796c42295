# Mask R-CNN R50-FPN, 100-epoch large-scale-jitter recipe (reference
# configs/new_baselines/mask_rcnn_R_50_FPN_100ep_LSJ.py): train-from-scratch
# style schedule with ResizeScale(0.1..2.0) + FixedSizeCrop(1024^2) +
# RandomFlip augmentation, batch 64.
import os

from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.config.lazy import LazyConfig
from cddmsl_tpu.data.transforms import FixedSizeCrop, RandomFlip, ResizeScale
from cddmsl_tpu.solver import multistep_schedule

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "mask_rcnn_fpn.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
dataloader = LazyConfig.load(os.path.join(_common, "data", "coco.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")

image_size = 1024
dataloader["train"]["augmentations"] = [
    L(ResizeScale)(
        min_scale=0.1, max_scale=2.0, target_height=image_size, target_width=image_size
    ),
    L(FixedSizeCrop)(crop_size=(image_size, image_size)),
    L(RandomFlip)(prob=0.5),
]
dataloader["train"]["pad_hw"] = (image_size, image_size)
dataloader["train"]["batch_size"] = 64
dataloader["test"]["pad_hw"] = (image_size, image_size)

# 100 epochs on COCO-118k at batch 64 = 184375 iters; decay at the
# reference's 0.889/0.963 fractions (milestones 163889, 177546)
train["max_iter"] = 184375
lr_multiplier = L(multistep_schedule)(
    base_lr=0.1, milestones=(163889, 177546), warmup_iters=250
)
optimizer["lr"] = 0.1
