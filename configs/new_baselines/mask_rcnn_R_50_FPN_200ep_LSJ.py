# reference configs/new_baselines/mask_rcnn_R_50_FPN_200ep_LSJ.py: the R50 100ep LSJ recipe with
# depth 50 and the schedule stretched 2x.
import os

from cddmsl_tpu.config.lazy import LazyConfig

_base = os.path.join(os.path.dirname(__file__), "mask_rcnn_R_50_FPN_100ep_LSJ.py")
model = LazyConfig.load(_base, "model")
optimizer = LazyConfig.load(_base, "optimizer")
dataloader = LazyConfig.load(_base, "dataloader")
train = LazyConfig.load(_base, "train")
lr_multiplier = LazyConfig.load(_base, "lr_multiplier")

model["depth"] = 50
train["max_iter"] = train["max_iter"] * 2
lr_multiplier["milestones"] = tuple(m * 2 for m in lr_multiplier["milestones"])
