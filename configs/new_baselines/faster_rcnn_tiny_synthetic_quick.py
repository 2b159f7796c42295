# new_baselines-style FULL RECIPE (reference configs/new_baselines/*.py):
# composes the common model/optim/schedule/data/train fragments and
# overrides for a quick synthetic run — runnable end-to-end by
# tools/lazyconfig_train_net.py on CPU in under a minute.
import os

from cddmsl_tpu.config.lazy import LazyCall as L  # noqa: F401 (for overrides)
from cddmsl_tpu.config.lazy import LazyConfig

_common = os.path.join(os.path.dirname(__file__), "..", "common")

model = LazyConfig.load(os.path.join(_common, "models", "mask_rcnn_c4.py"), "model")
optimizer = LazyConfig.load(os.path.join(_common, "optim.py"), "SGD")
lr_multiplier = LazyConfig.load(os.path.join(_common, "coco_schedule.py"), "lr_multiplier_1x")
dataloader = LazyConfig.load(os.path.join(_common, "data", "synthetic_detection.py"), "dataloader")
train = LazyConfig.load(os.path.join(_common, "train.py"), "train")

# recipe overrides: tiny network + short schedule on the 2-class fixture
model["backbone_depth"] = 10
model["embed_dim"] = 256
model["num_classes"] = 2
model["mask_on"] = False
model["rpn_pre_nms_topk"] = (256, 128)
model["rpn_post_nms_topk"] = (64, 32)
model["roi_batch_size_per_image"] = 32
model["detections_per_image"] = 20
optimizer["lr"] = 0.005
optimizer["clip_norm"] = 5.0
train["max_iter"] = 3
train["eval_period"] = 0
train["checkpoint_period"] = 0
train["mesh_shape"] = (1,)
