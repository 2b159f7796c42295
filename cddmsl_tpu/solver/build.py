"""Optimizer + LR schedules.

Mirrors the reference solver (detectron2/solver/build.py:113-219 SGD+momentum
with per-param behavior, :18-110 gradient clipping; lr_scheduler.py
WarmupMultiStepLR/WarmupCosineLR) on optax.

Freezing: torch marks requires_grad=False (FrozenBN buffers, the offline
backbone, the ClipCap mapper, text-embedding classifier rows, freeze_at
stages — SURVEY.md §2.1/§2.2). In JAX, freezing = a path-based mask: frozen
leaves get zeroed updates and no weight decay.
"""

import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------- schedules ----------------
def build_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    base_lr = cfg.SOLVER.BASE_LR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_method = cfg.SOLVER.WARMUP_METHOD
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    max_iter = cfg.SOLVER.MAX_ITER

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # warmup multiplier (reference lr_scheduler.py _get_warmup_factor_at_iter)
        if warmup_method == "linear":
            alpha = step / max(warmup_iters, 1)
            wf = jnp.where(step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        elif warmup_method == "constant":
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            raise ValueError(warmup_method)
        if name == "WarmupMultiStepLR":
            milestones = jnp.asarray(steps, jnp.float32) if steps else jnp.zeros((0,))
            decay = gamma ** jnp.sum(step >= milestones) if steps else 1.0
            return base_lr * wf * decay
        elif name == "WarmupCosineLR":
            return base_lr * wf * 0.5 * (1.0 + jnp.cos(jnp.pi * step / max_iter))
        else:
            raise ValueError(name)

    return schedule


# ---------------- freezing rules ----------------
_ALWAYS_FROZEN_SUBTREES = (
    "offline_backbone",
    "v2l_mapper",
    # pretraining (PretrainFastRCNN): distillation teacher, frozen caption
    # encoder and frozen concept pool
    "teacher_backbone",
    "lang_encoder",
    "concept_emb",
)
_FROZEN_BN_PARAMS = ("running_mean", "running_var")


def path_is_frozen(
    path: Tuple[str, ...],
    freeze_at: int = 2,
    use_text_emb: bool = True,
    frozen_bn_prefixes: Optional[set] = None,
) -> bool:
    parts = [str(p) for p in path]
    if any(p in _ALWAYS_FROZEN_SUBTREES for p in parts):
        return True
    # FrozenBN: all four buffers are non-trainable in the reference. A
    # SyncBN module (RESNETS.NORM=SyncBN) reuses the same bn* names but
    # keeps its running stats in the 'batch_stats' collection, so its
    # weight/bias ARE trainable: when the caller supplies the set of
    # bn-module prefixes that carry running stats in params (= FrozenBN),
    # only those subtrees freeze; without it, any bn-named path counts.
    if frozen_bn_prefixes is None:
        if any(p.startswith("bn") or p.endswith("_bn") for p in parts):
            return True
    else:
        for i in range(1, len(parts) + 1):
            if tuple(parts[:i]) in frozen_bn_prefixes:
                return True
    if parts[-1] in _FROZEN_BN_PARAMS:
        return True
    # text-embedding classifier rows are frozen (fast_rcnn.py:448-455)
    if use_text_emb and parts[-1] == "cls_score_weight":
        return True
    # freeze_at: 1 = stem, 2 = stem + layer1, ... (clip_backbone.py freeze())
    if "backbone" in parts:
        i = parts.index("backbone")
        rest = parts[i + 1 :]
        if rest:
            head = rest[0]
            if freeze_at >= 1 and head in ("conv1", "conv2", "conv3", "bn1", "bn2", "bn3"):
                return True
            for stage_idx in range(1, 5):
                if freeze_at >= stage_idx + 1 and head.startswith(f"layer{stage_idx}_"):
                    return True
    return False


def trainable_mask(params, freeze_at: int = 2, use_text_emb: bool = True):
    """Pytree of bools: True = trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def keys_of(path):
        return tuple(getattr(k, "key", getattr(k, "idx", str(k))) for k in path)

    # bn modules whose running stats live in params are FrozenBN; bn-named
    # modules WITHOUT them are SyncBN (stats in 'batch_stats') and trainable
    frozen_bn = {
        keys_of(p)[:-1] for p, _ in flat if str(keys_of(p)[-1]) == "running_mean"
    }

    def one(path):
        return not path_is_frozen(keys_of(path), freeze_at, use_text_emb, frozen_bn)

    leaves = {tuple(p): one(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(lambda p, _: leaves[tuple(p)], params)


# ---------------- optimizer ----------------
def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """SGD + momentum + coupled weight decay + (optional) grad clipping, with
    frozen-path masking. Matches torch.optim.SGD update order."""
    schedule = build_lr_schedule(cfg)
    mask = trainable_mask(
        params,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        use_text_emb=cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER,
    )
    frozen_mask = jax.tree_util.tree_map(lambda t: not t, mask)

    chain = []
    chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "norm":
            chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE))
    if cfg.SOLVER.WEIGHT_DECAY:
        wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
        if wd_bias is not None and wd_bias != cfg.SOLVER.WEIGHT_DECAY:
            import logging

            logging.getLogger(__name__).warning(
                "SOLVER.WEIGHT_DECAY_BIAS=%s differs from WEIGHT_DECAY=%s; "
                "uniform decay is applied (per-bias decay not supported)",
                wd_bias, cfg.SOLVER.WEIGHT_DECAY,
            )
        chain.append(optax.add_decayed_weights(cfg.SOLVER.WEIGHT_DECAY, mask=mask))
    if cfg.SOLVER.MOMENTUM:
        chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


# ---------------- LazyConfig-friendly builders ----------------
def multistep_schedule(
    base_lr: float = 0.02,
    milestones: Sequence[int] = (60000, 80000),
    gamma: float = 0.1,
    warmup_iters: int = 1000,
    warmup_factor: float = 0.001,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Explicit-args WarmupMultiStepLR (the LazyConfig equivalent of the
    reference configs/common/coco_schedule.py default_X_scheduler)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = step / max(warmup_iters, 1)
        wf = jnp.where(step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        ms = jnp.asarray(milestones, jnp.float32) if len(milestones) else jnp.zeros((0,))
        decay = gamma ** jnp.sum(step >= ms) if len(milestones) else 1.0
        return base_lr * wf * decay

    return schedule


def default_X_scheduler(num_X: float, base_lr: float = 0.02):
    """reference configs/common/coco_schedule.py:default_X_scheduler — the
    '1x/3x' COCO recipes (90k iters per 1x at batch 16)."""
    total = int(num_X * 90000)
    if num_X <= 2:
        milestones = (60000, 80000)
    else:
        milestones = (total - 60000, total - 20000)
    return multistep_schedule(base_lr=base_lr, milestones=milestones, warmup_iters=1000)


def sgd(
    lr: Any = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    clip_norm: Any = None,
) -> optax.GradientTransformation:
    """Explicit-args SGD chain (the LazyConfig equivalent of the reference
    configs/common/optim.py SGD). `lr` may be a float or a schedule callable.
    No frozen-path masking — lazy recipes own their freezing explicitly."""
    chain = []
    if clip_norm:
        chain.append(optax.clip_by_global_norm(float(clip_norm)))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.trace(decay=momentum, nesterov=False))
    if callable(lr):
        chain.append(optax.scale_by_schedule(lambda step: -lr(step)))
    else:
        chain.append(optax.scale(-float(lr)))
    return optax.chain(*chain)
