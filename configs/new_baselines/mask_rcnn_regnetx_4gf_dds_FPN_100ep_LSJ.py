# reference configs/new_baselines/mask_rcnn_regnetx_4gf_dds_FPN_100ep_LSJ.py:
# the R50 LSJ recipe with a RegNetX-4GF bottom-up, schedule x1.
import os

from cddmsl_tpu.config.lazy import LazyConfig

_here = os.path.dirname(__file__)
_base = os.path.join(_here, "mask_rcnn_R_50_FPN_100ep_LSJ.py")
_regnet = os.path.join(_here, "..", "COCO-InstanceSegmentation",
                       "mask_rcnn_regnetx_4gf_dds_fpn_1x.py")
model = LazyConfig.load(_regnet, "model")
optimizer = LazyConfig.load(_base, "optimizer")
dataloader = LazyConfig.load(_base, "dataloader")
train = LazyConfig.load(_base, "train")
lr_multiplier = LazyConfig.load(_base, "lr_multiplier")

train["max_iter"] = train["max_iter"] * 1
lr_multiplier["milestones"] = tuple(m * 1 for m in lr_multiplier["milestones"])
