import jax.numpy as jnp
import numpy as np

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.solver import build_lr_schedule, path_is_frozen


def test_warmup_multistep_schedule():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 1000
    cfg.SOLVER.WARMUP_FACTOR = 0.001
    cfg.SOLVER.STEPS = (60000, 80000)
    cfg.SOLVER.GAMMA = 0.1
    s = build_lr_schedule(cfg)
    assert abs(float(s(0)) - 0.002 * 0.001) < 1e-9
    assert abs(float(s(500)) - 0.002 * (0.001 * 0.5 + 0.5)) < 1e-8
    assert abs(float(s(1000)) - 0.002) < 1e-9
    assert abs(float(s(59999)) - 0.002) < 1e-9
    assert abs(float(s(60000)) - 0.0002) < 1e-9
    assert abs(float(s(80001)) - 0.00002) < 1e-10


def test_warmup_cosine_schedule():
    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MAX_ITER = 100
    cfg.SOLVER.WARMUP_ITERS = 0
    s = build_lr_schedule(cfg)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert abs(float(s(50)) - 0.5) < 1e-6


def test_freeze_rules():
    # always frozen: offline backbone, v2l mapper, FrozenBN buffers, text emb
    assert path_is_frozen(("offline_backbone", "layer3_0", "conv1", "kernel"))
    assert path_is_frozen(("v2l_mapper", "linear", "kernel"))
    assert path_is_frozen(("backbone", "layer3_0", "bn1", "weight"))
    assert path_is_frozen(("backbone", "layer3_0", "downsample_bn", "weight"))
    assert path_is_frozen(("roi_heads", "box_predictor", "cls_score_weight"))
    # freeze_at=2: stem + layer1
    assert path_is_frozen(("backbone", "conv1", "kernel"), freeze_at=2)
    assert path_is_frozen(("backbone", "layer1_2", "conv3", "kernel"), freeze_at=2)
    # trainable: layer2+, RPN, bbox head, projector, attnpool
    assert not path_is_frozen(("backbone", "layer2_0", "conv1", "kernel"), freeze_at=2)
    assert not path_is_frozen(("backbone", "layer4_0", "conv1", "kernel"), freeze_at=2)
    assert not path_is_frozen(("backbone", "attnpool", "q_proj", "kernel"))
    assert not path_is_frozen(("proposal_generator", "head", "conv", "kernel"))
    assert not path_is_frozen(("roi_heads", "box_predictor", "bbox_pred", "kernel"))
    assert not path_is_frozen(("projector", "fc1", "kernel"))
    # freeze_at=0: stem trainable
    assert not path_is_frozen(("backbone", "conv1", "kernel"), freeze_at=0)
