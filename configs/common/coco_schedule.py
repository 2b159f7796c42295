# LazyConfig LR schedules (reference configs/common/coco_schedule.py):
# the "1x/3x" COCO multi-step recipes (90k iters per 1x at batch 16, decay
# at -30k/-10k per "Rethinking ImageNet Pretraining" Sec 4).
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.solver import default_X_scheduler

lr_multiplier_1x = L(default_X_scheduler)(num_X=1)
lr_multiplier_2x = L(default_X_scheduler)(num_X=2)
lr_multiplier_3x = L(default_X_scheduler)(num_X=3)
lr_multiplier_6x = L(default_X_scheduler)(num_X=6)
lr_multiplier_9x = L(default_X_scheduler)(num_X=9)
