# reference configs/COCO-Detection/retinanet_R_50_FPN_1x.py: the lazy twin
# of retinanet_R_50_FPN_1x.yaml, composed from common fragments.
import os

from cddmsl_tpu.config.lazy import LazyConfig

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "retinanet.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
lr_multiplier = LazyConfig.load(os.path.join(_common, "coco_schedule.py"), "lr_multiplier_1x")
dataloader = LazyConfig.load(os.path.join(_common, "data", "coco.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")
optimizer["lr"] = 0.01  # reference: RetinaNet trains at half the R-CNN LR
