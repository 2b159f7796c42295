# LazyConfig optimizer recipes (reference configs/common/optim.py): the
# COCO-default SGD. `lr` may be overridden with a schedule from
# coco_schedule.py before instantiation.
from cddmsl_tpu.config.lazy import LazyCall as L
from cddmsl_tpu.solver import sgd

SGD = L(sgd)(lr=0.02, momentum=0.9, weight_decay=1e-4, clip_norm=None)
