"""Mean-teacher (Adaptive-Teacher-style) config extension.

Mirrors `add_ateacher_config` (reference detectron2/config/config.py:13-58):
the `SEMISUPNET.*` block, two-stream batch sizes, labeled/unlabeled dataset
splits, and EMA settings used by the semi-supervised loop.
"""

from .cfg_node import CfgNode


def add_ateacher_config(cfg: CfgNode) -> None:
    _C = cfg

    _C.TEST.VAL_LOSS = True

    _C.MODEL.RPN.UNSUP_LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.LOSS = "CrossEntropy"
    _C.MODEL.ROI_HEADS.LOSS = "CrossEntropy"

    _C.SOLVER.IMG_PER_BATCH_LABEL = 1
    _C.SOLVER.IMG_PER_BATCH_UNLABEL = 1
    _C.SOLVER.FACTOR_LIST = (1,)

    _C.DATASETS.TRAIN_LABEL = ("coco_2017_train",)
    _C.DATASETS.TRAIN_UNLABEL = ("coco_2017_train",)
    _C.DATASETS.CROSS_DATASET = True
    _C.TEST.EVALUATOR = "COCOeval"

    _C.SEMISUPNET = CfgNode()
    # output dim of the MLP projector after res5 (reference config.py:36)
    _C.SEMISUPNET.MLP_DIM = 128
    # NOTE: the reference defaults this to "ateacher" (config.py:20) but its
    # train_net.py never dispatches on it for the CDDMSL runs; here "default"
    # selects DefaultTrainer and mean-teacher configs opt in explicitly.
    _C.SEMISUPNET.Trainer = "default"
    _C.SEMISUPNET.BBOX_THRESHOLD = 0.8
    _C.SEMISUPNET.PSEUDO_BBOX_SAMPLE = "thresholding"
    _C.SEMISUPNET.TEACHER_UPDATE_ITER = 1
    _C.SEMISUPNET.BURN_UP_STEP = 12000
    _C.SEMISUPNET.EMA_KEEP_RATE = 0.9996
    _C.SEMISUPNET.UNSUP_LOSS_WEIGHT = 0.5
    _C.SEMISUPNET.SUP_LOSS_WEIGHT = 1.0
    _C.SEMISUPNET.LOSS_WEIGHT_TYPE = "standard"
    _C.SEMISUPNET.DIS_TYPE = "res4"
    _C.SEMISUPNET.DIS_LOSS_WEIGHT = 0.1
    # Golden pin on the FINAL teacher's pseudo-labels (the quick-schedules
    # analogue of TEST.EXPECTED_RESULTS for the EMA/threshold loop):
    # [count, precision, precision_tol] checked by MeanTeacherTrainer at
    # end of train() against the first weak unlabeled batch — count exact,
    # precision (IoU>0.5 same-class vs fixture GT) within tol.
    _C.SEMISUPNET.EXPECTED_PSEUDO = []

    _C.EMAMODEL = CfgNode()
    _C.EMAMODEL.SUP_CONSIST = True

    _C.DATALOADER.SUP_PERCENT = 100.0
    _C.DATALOADER.RANDOM_DATA_SEED = 0
    _C.DATALOADER.RANDOM_DATA_SEED_PATH = "dataseed/COCO_supervision.txt"
