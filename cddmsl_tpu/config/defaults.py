"""Default config tree.

Mirrors the key surface of the reference defaults
(detectron2/config/defaults.py:18-753) including the `MODEL.CLIP.*` block
(:195-238) and the CDDMSL keys `MODEL.KD_REGULRAZIATION` /
`MODEL.PRE_TRAINED_RCLIP_PATH` / `MODEL.VISION_TO_LANG_PATH` (:30-32),
plus TPU-native additions under `TPU.*` (static-shape capacities, mesh,
precision) that have no GPU analogue.
"""

from .cfg_node import CfgNode


def get_default_cfg() -> CfgNode:
    _C = CfgNode()

    _C.VERSION = 2
    _C.OUTPUT_DIR = "./output"
    _C.SEED = -1
    _C.CUDNN_BENCHMARK = False  # accepted for config compat; no-op on TPU

    # ---------------- MODEL ----------------
    _C.MODEL = CfgNode()
    _C.MODEL.DEVICE = "tpu"
    _C.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.MASK_ON = False
    _C.MODEL.KEYPOINT_ON = False
    _C.MODEL.LOAD_PROPOSALS = False
    # CLIP pixel stats by default come from the experiment configs; these are
    # the ImageNet-ish defaults of the reference (defaults.py).
    _C.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    _C.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    # CDDMSL additions (reference defaults.py:30-32)
    # (sic) reference key name kept for config compat; default True matches
    # reference defaults.py:30 — the AdverseWeather DG recipe trains with the
    # L1 KD term ON (its yaml sets it explicitly; the baseline yaml relies on
    # this default)
    _C.MODEL.KD_REGULRAZIATION = True
    _C.MODEL.PRE_TRAINED_RCLIP_PATH = ""
    _C.MODEL.VISION_TO_LANG_PATH = ""
    # Alternative consistency branches (reference rcnn.py:471-591 forward()
    # branch strings, selected ad hoc in the reference code; here a YAML
    # knob — r3 VERDICT next-round #7). "" = the default caption-consistency
    # recipe; "image"/"image_region" add the language-free InfoNCE branches
    # to the train step; "caption_pl_img"/"caption_pl_region" run the
    # pseudo-label caption step (engine/train_loop.py make_caption_pl_step,
    # a second jitted update per iteration so the scan-decode never burdens
    # the default graph).
    _C.MODEL.CONSISTENCY_BRANCH = ""
    _C.MODEL.CONSISTENCY_LOSS_WEIGHT = 0.1
    _C.MODEL.CAPTION_PL_LOSS = "pseudo_label"  # or "kl" (unsupervised_loss)
    _C.MODEL.CAPTION_PL_MAX_LEN = 20
    _C.MODEL.CAPTION_GPT2_PATH = ""  # HF GPT-2 state dict for the pl decoder

    # ---------------- MODEL.BACKBONE ----------------
    _C.MODEL.BACKBONE = CfgNode()
    _C.MODEL.BACKBONE.NAME = "build_clip_resnet_backbone"
    _C.MODEL.BACKBONE.FREEZE_AT = 2

    # ---------------- MODEL.RESNETS ----------------
    _C.MODEL.RESNETS = CfgNode()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    _C.MODEL.RESNETS.NUM_GROUPS = 1
    _C.MODEL.RESNETS.NORM = "FrozenBN"
    _C.MODEL.RESNETS.WIDTH_PER_GROUP = 64
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64
    _C.MODEL.RESNETS.RES2_OUT_CHANNELS = 256
    _C.MODEL.RESNETS.STRIDE_IN_1X1 = True
    _C.MODEL.RESNETS.RES5_DILATION = 1
    _C.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, False, False]
    _C.MODEL.RESNETS.DEFORM_MODULATED = False
    _C.MODEL.RESNETS.DEFORM_NUM_GROUPS = 1

    # ---------------- MODEL.FPN ----------------
    _C.MODEL.FPN = CfgNode()
    _C.MODEL.FPN.IN_FEATURES = []
    _C.MODEL.FPN.OUT_CHANNELS = 256
    _C.MODEL.FPN.NORM = ""
    _C.MODEL.FPN.FUSE_TYPE = "sum"

    # ---------------- MODEL.RETINANET (reference defaults.py RETINANET) ----
    _C.MODEL.RETINANET = CfgNode()
    _C.MODEL.RETINANET.NUM_CLASSES = 80
    _C.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5", "p6", "p7"]
    _C.MODEL.RETINANET.NUM_CONVS = 4
    _C.MODEL.RETINANET.IOU_THRESHOLDS = [0.4, 0.5]
    _C.MODEL.RETINANET.IOU_LABELS = [0, -1, 1]
    _C.MODEL.RETINANET.PRIOR_PROB = 0.01
    _C.MODEL.RETINANET.SCORE_THRESH_TEST = 0.05
    _C.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 1000
    _C.MODEL.RETINANET.NMS_THRESH_TEST = 0.5
    _C.MODEL.RETINANET.BBOX_REG_WEIGHTS = [1.0, 1.0, 1.0, 1.0]
    _C.MODEL.RETINANET.FOCAL_LOSS_GAMMA = 2.0
    _C.MODEL.RETINANET.FOCAL_LOSS_ALPHA = 0.25
    _C.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA = 0.1
    _C.MODEL.RETINANET.BBOX_REG_LOSS_TYPE = "smooth_l1"  # or "giou"
    _C.MODEL.RETINANET.NORM = ""  # head-conv norm ("" | "GN")

    # ---------------- MODEL.ANCHOR_GENERATOR ----------------
    _C.MODEL.ANCHOR_GENERATOR = CfgNode()
    _C.MODEL.ANCHOR_GENERATOR.NAME = "DefaultAnchorGenerator"
    _C.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64, 128, 256, 512]]
    _C.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    _C.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
    _C.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    # ---------------- MODEL.PROPOSAL_GENERATOR ----------------
    _C.MODEL.PROPOSAL_GENERATOR = CfgNode()
    _C.MODEL.PROPOSAL_GENERATOR.NAME = "RPN"  # or "PrecomputedProposals"
    _C.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

    # ---------------- MODEL.RPN ----------------
    _C.MODEL.RPN = CfgNode()
    _C.MODEL.RPN.HEAD_NAME = "StandardRPNHead"
    _C.MODEL.RPN.IN_FEATURES = ["res4"]
    _C.MODEL.RPN.BOUNDARY_THRESH = -1
    _C.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
    _C.MODEL.RPN.IOU_LABELS = [0, -1, 1]
    _C.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    _C.MODEL.RPN.POSITIVE_FRACTION = 0.5
    _C.MODEL.RPN.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    _C.MODEL.RPN.SMOOTH_L1_BETA = 0.0
    _C.MODEL.RPN.LOSS_WEIGHT = 1.0
    _C.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 12000
    _C.MODEL.RPN.PRE_NMS_TOPK_TEST = 6000
    _C.MODEL.RPN.POST_NMS_TOPK_TRAIN = 2000
    _C.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    _C.MODEL.RPN.NMS_THRESH = 0.7
    _C.MODEL.RPN.CONV_DIMS = [-1]

    # ---------------- MODEL.ROI_HEADS ----------------
    _C.MODEL.ROI_HEADS = CfgNode()
    _C.MODEL.ROI_HEADS.NAME = "CLIPRes5ROIHeads"
    _C.MODEL.ROI_HEADS.NUM_CLASSES = 80
    _C.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    _C.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    _C.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    _C.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    _C.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    _C.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    _C.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    _C.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = True
    _C.MODEL.ROI_HEADS.SOFT_NMS_ENABLED = False
    _C.MODEL.ROI_HEADS.SOFT_NMS_METHOD = "gaussian"
    _C.MODEL.ROI_HEADS.SOFT_NMS_SIGMA = 0.5
    _C.MODEL.ROI_HEADS.SOFT_NMS_PRUNE = 0.001

    _C.MODEL.ROI_BOX_HEAD = CfgNode()
    _C.MODEL.ROI_BOX_HEAD.NAME = ""
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE = "smooth_l1"
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT = 1.0
    _C.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    _C.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
    _C.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    _C.MODEL.ROI_BOX_HEAD.NUM_FC = 0
    _C.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    _C.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
    _C.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
    _C.MODEL.ROI_BOX_HEAD.NORM = ""
    _C.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
    _C.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = False

    # ---------------- MODEL.SEM_SEG_HEAD (reference defaults.py:350-370) ----------------
    _C.MODEL.SEM_SEG_HEAD = CfgNode()
    _C.MODEL.SEM_SEG_HEAD.NAME = "SemSegFPNHead"
    _C.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 54
    _C.MODEL.SEM_SEG_HEAD.IGNORE_VALUE = 255
    _C.MODEL.SEM_SEG_HEAD.CONVS_DIM = 128
    _C.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    _C.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT = 1.0
    _C.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    _C.MODEL.SEM_SEG_HEAD.NORM = "GN"
    _C.MODEL.PANOPTIC_FPN = CfgNode()
    _C.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT = 1.0
    _C.MODEL.PANOPTIC_FPN.COMBINE = CfgNode()
    _C.MODEL.PANOPTIC_FPN.COMBINE.ENABLED = True
    _C.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH = 0.5
    _C.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT = 4096
    _C.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH = 0.5

    # ---------------- MODEL.ROI_MASK_HEAD (reference defaults.py:460-470) ----------------
    _C.MODEL.ROI_MASK_HEAD = CfgNode()
    _C.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    _C.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_MASK_HEAD.NUM_CONV = 0  # 0 for C4 (deconv+predictor only)
    _C.MODEL.ROI_MASK_HEAD.CONV_DIM = 256
    _C.MODEL.ROI_MASK_HEAD.NORM = ""
    _C.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = False
    _C.MODEL.ROI_MASK_HEAD.POOLER_TYPE = "ROIAlignV2"

    # ------------- MODEL.ROI_BOX_CASCADE_HEAD (reference defaults.py:451-459) -------------
    _C.MODEL.ROI_BOX_CASCADE_HEAD = CfgNode()
    _C.MODEL.ROI_BOX_CASCADE_HEAD.IOUS = [0.5, 0.6, 0.7]
    _C.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS = [
        [10.0, 10.0, 5.0, 5.0],
        [20.0, 20.0, 10.0, 10.0],
        [30.0, 30.0, 15.0, 15.0],
    ]

    # ------------- MODEL.ROI_KEYPOINT_HEAD (reference defaults.py:471-484) -------------
    _C.MODEL.ROI_KEYPOINT_HEAD = CfgNode()
    _C.MODEL.ROI_KEYPOINT_HEAD.NAME = "KRCNNConvDeconvUpsampleHead"
    _C.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 14
    _C.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 0
    _C.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = [512] * 8
    _C.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 17  # COCO person
    _C.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT = 1.0
    _C.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE = "ROIAlignV2"
    # train-time dataset filter: drop images with fewer visible keypoints
    _C.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE = 1
    # True: CE normalizer = #visible keypoints in the batch (reference
    # roi_heads/keypoint_head.py keypoint_rcnn_loss)
    _C.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS = True

    # ---------------- MODEL.CLIP (reference defaults.py:195-238) ----------------
    _C.MODEL.CLIP = CfgNode()
    _C.MODEL.CLIP.CROP_REGION_TYPE = "RPN"
    _C.MODEL.CLIP.BB_RPN_WEIGHTS = None
    _C.MODEL.CLIP.IMS_PER_BATCH_TEST = 8
    _C.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER = False
    _C.MODEL.CLIP.TEXT_EMB_PATH = None
    _C.MODEL.CLIP.OFFLINE_RPN_CONFIG = None
    _C.MODEL.CLIP.NO_BOX_DELTA = False
    _C.MODEL.CLIP.BG_CLS_LOSS_WEIGHT = None
    _C.MODEL.CLIP.ONLY_SAMPLE_FG_PROPOSALS = False
    _C.MODEL.CLIP.MULTIPLY_RPN_SCORE = False
    _C.MODEL.CLIP.OPENSET_TEST_NUM_CLASSES = None
    _C.MODEL.CLIP.OPENSET_TEST_TEXT_EMB_PATH = None
    _C.MODEL.CLIP.CLSS_TEMP = 0.01
    _C.MODEL.CLIP.RUN_CVPR_OVR = False
    _C.MODEL.CLIP.FOCAL_SCALED_LOSS = None
    _C.MODEL.CLIP.OFFLINE_RPN_NMS_THRESH = 0.9
    _C.MODEL.CLIP.PRETRAIN_IMG_TXT_LEVEL = True
    _C.MODEL.CLIP.PRETRAIN_ONLY_EOT = False
    _C.MODEL.CLIP.PRETRAIN_RPN_REGIONS = None
    _C.MODEL.CLIP.PRETRAIN_SAMPLE_REGIONS = None
    _C.MODEL.CLIP.GATHER_GPUS = False
    _C.MODEL.CLIP.GRID_REGIONS = False
    _C.MODEL.CLIP.CONCEPT_POOL_EMB = None
    _C.MODEL.CLIP.CONCEPT_THRES = None
    _C.MODEL.CLIP.OFFLINE_RPN_LSJ_PRETRAINED = False
    _C.MODEL.CLIP.VIS = False  # visualization mode (reference clip_rcnn.py)
    _C.MODEL.CLIP.GET_CONCEPT_EMB = False  # concept-embedding extraction mode
    _C.MODEL.CLIP.OFFLINE_RPN_POST_NMS_TOPK_TEST = None
    # pretraining text tower (reference clip_backbone.py:732-814 dims)
    _C.MODEL.CLIP.PRETRAIN_NUM_CONCEPTS = 1000
    _C.MODEL.CLIP.TEXT_VOCAB_SIZE = 49408
    _C.MODEL.CLIP.TEXT_CONTEXT_LENGTH = 77
    _C.MODEL.CLIP.TEXT_WIDTH = 512
    _C.MODEL.CLIP.TEXT_HEADS = 8
    _C.MODEL.CLIP.TEXT_LAYERS = 12
    _C.MODEL.CLIP.TEACHER_RESNETS_DEPTH = 50
    _C.MODEL.CLIP.TEACHER_CONCEPT_POOL_EMB = None
    _C.MODEL.CLIP.TEACHER_POOLER_RESOLUTION = 14
    _C.MODEL.CLIP.TEXT_EMB_DIM = 1024

    # ---------------- MODEL.TEXT_ENCODER (lang encoder hyperparams) ----------------
    _C.MODEL.TEXT_ENCODER = CfgNode()
    _C.MODEL.TEXT_ENCODER.CONTEXT_LENGTH = 77
    _C.MODEL.TEXT_ENCODER.VOCAB_SIZE = 49408
    _C.MODEL.TEXT_ENCODER.WIDTH = 512
    _C.MODEL.TEXT_ENCODER.HEADS = 8
    _C.MODEL.TEXT_ENCODER.LAYERS = 12

    # ---------------- INPUT ----------------
    _C.INPUT = CfgNode()
    _C.INPUT.MIN_SIZE_TRAIN = (800,)
    _C.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    _C.INPUT.MAX_SIZE_TRAIN = 1333
    _C.INPUT.MIN_SIZE_TEST = 800
    _C.INPUT.MAX_SIZE_TEST = 1333
    _C.INPUT.RANDOM_FLIP = "horizontal"
    _C.INPUT.CROP = CfgNode()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "relative_range"
    _C.INPUT.CROP.SIZE = [0.9, 0.9]
    _C.INPUT.FORMAT = "BGR"
    _C.INPUT.MASK_FORMAT = "polygon"
    _C.INPUT.TEXT_TOKENIZER = "openai_bpe"  # RegionCLIP pretrain tokenizer

    # ---------------- DATASETS ----------------
    _C.DATASETS = CfgNode()
    _C.DATASETS.TRAIN = ()
    _C.DATASETS.TEST = ()
    _C.DATASETS.PROPOSAL_FILES_TRAIN = ()
    _C.DATASETS.PROPOSAL_FILES_TEST = ()
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 2000
    _C.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 1000
    # RegionCLIP TSV/factory dataset surface (reference defaults.py; consumed
    # by data/clip_datasets.py for image-text TSV pretraining — the factory
    # indirection itself is flattened into build.py's catalog dispatch)
    _C.DATASETS.FACTORY_TRAIN = ()
    _C.DATASETS.PATH_TRAIN = ()
    _C.DATASETS.AUX = ()
    _C.DATASETS.FACTORY_AUX = ()
    _C.DATASETS.PATH_AUX = ()
    _C.DATASETS.FACTORY_TEST = ()
    _C.DATASETS.PATH_TEST = ()
    _C.DATASETS.LABELMAP_FILE = ""
    _C.DATASETS.ATTR_LABELMAP_FILE = ""
    _C.DATASETS.FILTERED_CLASSIFICATION_DATASETS = ""
    _C.DATASETS.HIERARCHY_FILE = ""
    _C.DATASETS.BOX_EXTRA_FIELDS = ()
    _C.DATASETS.NUM_CLASSES = 0
    _C.DATASETS.ROOT = ""
    _C.DATASETS.TRAIN_SET = "train"
    _C.DATASETS.VAL_SET = ""
    _C.DATASETS.TEST_SET = "val"
    _C.DATASETS.MAX_SEQ_LENGTH = 35
    # semi-supervised (add_ateacher_config merges TRAIN_LABEL/TRAIN_UNLABEL)

    # ---------------- DATALOADER ----------------
    _C.DATALOADER = CfgNode()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.ASPECT_RATIO_GROUPING = True
    _C.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    _C.DATALOADER.REPEAT_THRESHOLD = 0.0
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True

    # ---------------- SOLVER ----------------
    _C.SOLVER = CfgNode()
    _C.SOLVER.IMS_PER_BATCH = 16
    _C.SOLVER.BASE_LR = 0.001
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.NESTEROV = False
    _C.SOLVER.WEIGHT_DECAY = 0.0001
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    # reference defaults.py value; build_optimizer applies uniform WD, which
    # is exactly the reference behavior whenever WEIGHT_DECAY_BIAS ==
    # WEIGHT_DECAY (as here) — a differing value logs a warning
    _C.SOLVER.WEIGHT_DECAY_BIAS = 0.0001
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.STEPS = (30000,)
    _C.SOLVER.MAX_ITER = 40000
    _C.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    _C.SOLVER.WARMUP_ITERS = 1000
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    _C.SOLVER.CHECKPOINT_PERIOD = 1000  # reference (CDDMSL fork) default
    # keep at most this many periodic checkpoints on disk (0 = unlimited);
    # the final model_final save is never GC'd
    _C.SOLVER.CHECKPOINT_MAX_TO_KEEP = 0
    # in-step gradient accumulation: IMS_PER_BATCH is split into this many
    # sequential microbatches per optimizer step (activation memory is
    # per-microbatch; no reference counterpart — DDP scales by adding GPUs)
    _C.SOLVER.ACCUM_STEPS = 1
    _C.SOLVER.BIAS_LR_FACTOR = 1.0
    _C.SOLVER.REFERENCE_WORLD_SIZE = 0
    _C.SOLVER.CLIP_GRADIENTS = CfgNode()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = False
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"  # reference default ("value" | "norm")
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    _C.SOLVER.AMP = CfgNode()
    _C.SOLVER.AMP.ENABLED = False
    # CDDMSL: caption-consistency branches activate after this many iters
    # (the reference hardcodes `self.iter <= 10000`, train_loop.py:334-360)
    _C.SOLVER.CAPTION_BURNUP_ITERS = 10000

    # ---------------- TEST ----------------
    _C.TEST = CfgNode()
    _C.TEST.EVAL_PERIOD = 0
    _C.TEST.EXPECTED_RESULTS = []
    _C.TEST.DETECTIONS_PER_IMAGE = 100
    _C.TEST.KEYPOINT_OKS_SIGMAS = []  # override metadata sigmas when set
    _C.TEST.AUG = CfgNode()
    _C.TEST.AUG.ENABLED = False
    _C.TEST.AUG.MIN_SIZES = (400, 500, 600, 700, 800, 900, 1000, 1100, 1200)
    _C.TEST.AUG.MAX_SIZE = 4000
    _C.TEST.AUG.FLIP = True
    _C.TEST.PRECISE_BN = CfgNode()
    _C.TEST.PRECISE_BN.ENABLED = False
    _C.TEST.PRECISE_BN.NUM_ITER = 200

    # ---------------- AUG (RegionCLIP pretrain augmentation surface) -------
    # reference defaults.py _C.AUG: classification-style augmentation for the
    # image-text pretraining pipeline. SimCLR-family knobs (SCALE/RATIO/
    # COLOR_JITTER/GRAY_SCALE/GAUSSIAN_BLUR) are realized by
    # data/transforms.py build_strong_augmentation_fn; the timm/mixup entries
    # are config-surface kept for checkpoint/recipe compat (USE_TIMM defaults
    # off in the reference too, and timm is not a dependency here).
    _C.AUG = CfgNode()
    _C.AUG.SCALE = (0.08, 1.0)
    _C.AUG.RATIO = (3.0 / 4.0, 4.0 / 3.0)
    _C.AUG.COLOR_JITTER = [0.4, 0.4, 0.4, 0.1, 0.0]
    _C.AUG.GRAY_SCALE = 0.0
    _C.AUG.GAUSSIAN_BLUR = 0.0
    _C.AUG.DROPBLOCK_LAYERS = [3, 4]
    _C.AUG.DROPBLOCK_KEEP_PROB = 1.0
    _C.AUG.DROPBLOCK_BLOCK_SIZE = 7
    _C.AUG.MIXUP_PROB = 0.0
    _C.AUG.MIXUP = 0.0
    _C.AUG.MIXCUT = 0.0
    _C.AUG.MIXCUT_MINMAX = []
    _C.AUG.MIXUP_SWITCH_PROB = 0.5
    _C.AUG.MIXUP_MODE = "batch"
    _C.AUG.MIXCUT_AND_MIXUP = False
    _C.AUG.INTERPOLATION = 3
    _C.AUG.USE_TIMM = False
    _C.AUG.TIMM_AUG = CfgNode()
    _C.AUG.TIMM_AUG.USE_LOADER = False
    _C.AUG.TIMM_AUG.USE_TRANSFORM = False
    _C.AUG.TRAIN = CfgNode()
    _C.AUG.TRAIN.IMAGE_SIZE = [224, 224]
    _C.AUG.TRAIN.MAX_SIZE = None
    _C.AUG.TEST = CfgNode()
    _C.AUG.TEST.IMAGE_SIZE = [224, 224]
    _C.AUG.TEST.MAX_SIZE = None
    _C.AUG.TEST.CENTER_CROP = False
    _C.AUG.TEST.INTERPOLATION = 3

    # visualize_test.py input directory (reference defaults.py INPUT_DIR)
    _C.INPUT_DIR = "./datasets/custom_images"

    # ---------------- TPU-native additions ----------------
    _C.TPU = CfgNode()
    _C.TPU.MESH_SHAPE = [-1]          # -1 = all devices on one 'data' axis
    _C.TPU.MESH_AXES = ["data"]
    # tensor parallelism: MESH_SHAPE=[dp, mp] + MESH_AXES=['data','model']
    # activates rule-based param sharding (parallel/tp.py); empty = defaults
    # (Megatron MLP split on every transformer MLP)
    _C.TPU.TP_RULES = []
    # spatial partitioning: shard the input images' H axis over the 'model'
    # mesh axis (requires a 2-D mesh). XLA runs the full-res backbone on
    # H-shards with halo-exchange collectives — per-chip activation memory
    # for the early conv stages drops by the model-axis size. Composes with
    # TP_RULES (parallel/mesh.py shard_batch).
    _C.TPU.SPATIAL_PARTITION = False
    # fully-sharded data parallelism (ZeRO-3-style): shard every parameter
    # and optimizer moment >= FSDP_MIN_SIZE elements on its largest
    # divisible dim over 'data'; XLA all-gathers weights before use and
    # reduce-scatters gradients (parallel/fsdp.py). Composes with TP_RULES.
    _C.TPU.FSDP = False
    _C.TPU.FSDP_MIN_SIZE = 4096
    # pipeline parallelism (GPipe, parallel/pp.py): name a mesh axis (e.g.
    # 'pipe' with MESH_SHAPE=[dp, pp] + MESH_AXES=['data','pipe']) and the
    # in-graph transformer stacks — the ClipCap V2L mapper inside the CDDMSL
    # step and the CLIP text encoder inside the pretrain step — run as
    # microbatched pipelines over it (block params sharded per stage,
    # ppermute hops between stages). "" = off. Composes with DP/TP/SP.
    _C.TPU.PIPELINE_AXIS = ""
    _C.TPU.PIPELINE_MICROBATCHES = 0  # 0 = pipe-axis size
    # expert parallelism (Switch/GShard MoE, parallel/ep.py): NUM_EXPERTS>0
    # swaps the CDDMSL contrastive projector MLP for a top-1-routed mixture
    # of NUM_EXPERTS expert MLPs (parameter count x E at constant per-token
    # FLOPs), with the Switch load-balance aux loss added to the training
    # objective. EXPERT_AXIS names the mesh axis that shards the expert
    # params + compute ("" = dense, single-program MoE). Composes with
    # DP/TP/PP/SP.
    _C.TPU.MOE = CfgNode()
    _C.TPU.MOE.NUM_EXPERTS = 0
    _C.TPU.MOE.CAPACITY_FACTOR = 1.25
    _C.TPU.MOE.EXPERT_AXIS = "model"
    _C.TPU.MOE.AUX_WEIGHT = 0.01
    # serving-path PTQ: evaluate with the res5 RoI stage quantized to int8
    # (per-channel weights, absmax-calibrated per-tensor activations; the
    # MXU runs s8xs8->s32 at ~1.8x the bf16 rate — quant/ptq.py)
    _C.TPU.QUANT_EVAL = False
    _C.TPU.QUANT_CALIB_BATCHES = 4
    _C.TPU.ASYNC_CHECKPOINT = False  # orbax AsyncCheckpointer: save off the
    # training thread (device_get happens synchronously; serialization +
    # disk IO overlap subsequent steps)
    _C.TPU.COMPUTE_DTYPE = "bfloat16"  # conv/matmul compute dtype
    _C.TPU.PARAM_DTYPE = "float32"
    # static-shape capacities (pad-and-mask discipline; SURVEY.md §7 point 1)
    _C.TPU.MAX_GT_BOXES = 100
    # RoIAlign processes ROIs in chunks of this size (ops/roi_align.py):
    # bounds the (r, PW, H, C) matmul intermediate; larger chunks = fewer
    # sequential lax.map iterations, more HBM (docs/PERF.md round 3)
    _C.TPU.ROI_CHUNK_SIZE = 128
    _C.TPU.PAD_SIZE_TRAIN = [800, 1344]   # H, W after resize; multiple of 16
    _C.TPU.PAD_SIZE_TEST = [800, 1344]
    # optional pad-bucket LADDER: list of [H, W] (landscape); each image goes
    # to the smallest bucket that fits (either orientation). One compiled
    # step per bucket x orientation. E.g. [[800, 1088], [800, 1344]] cuts
    # ~20% backbone FLOPs on VOC's ~4:3 images (docs/PERF.md lever #2).
    _C.TPU.PAD_BUCKETS = []
    _C.TPU.NMS_PAD = 0                 # 0 = use POST_NMS_TOPK
    _C.TPU.REGION_CONSISTENCY_BOXES = 16  # randperm[:16] in reference rcnn.py:437
    _C.TPU.V2L_IMAGE_SIZE = 224
    _C.TPU.ENABLE_CAPTION_CONSISTENCY = True
    _C.TPU.REMAT_BACKBONE = True  # jax.checkpoint on bottleneck blocks
    _C.TPU.PALLAS_ROI_ALIGN = False  # experimental fused-VMEM kernel (docs/PERF.md)
    # compile-light overrides for tests / the CPU multichip dryrun: shrink the
    # network (not just the proposal counts) so a cold-cache CPU compile of
    # the full CDDMSL step finishes in seconds. Empty/0 = derive from
    # MODEL.RESNETS.DEPTH as usual.
    _C.TPU.BACKBONE_LAYERS = []    # blocks per stage, e.g. [1, 1, 1, 1]
    _C.TPU.BACKBONE_WIDTH = 0      # stem width, e.g. 16
    _C.TPU.EMBED_DIM = 0           # CLIP embed dim, e.g. 128
    _C.TPU.V2L_MAPPER_LAYERS = 8   # ClipCap TransformerMapper depth
    _C.TPU.V2L_MAPPER_TOKENS = 40  # ClipCap prefix/clip length
    # GPT-2 dims for the caption_pl decoder (MODEL.CONSISTENCY_BRANCH =
    # caption_pl_*): defaults are the real HF gpt2; instant tests shrink them
    _C.TPU.GPT2_VOCAB = 50257
    _C.TPU.GPT2_POSITIONS = 1024
    _C.TPU.GPT2_EMBD = 768
    _C.TPU.GPT2_LAYERS = 12
    _C.TPU.GPT2_HEADS = 12
    _C.TPU.FAST_INIT = False       # eval_shape param fill instead of real init
    _C.TPU.MASK_CANVAS_STRIDE = 4  # GT bitmask canvas downsample (MASK_ON)

    # ---------------- VIS / MISC ----------------
    _C.VIS_PERIOD = 0
    _C.GLOBAL = CfgNode()
    _C.GLOBAL.HACK = 1.0

    return _C
