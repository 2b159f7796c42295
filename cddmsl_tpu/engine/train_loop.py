"""The CDDMSL training step as ONE jitted program.

Mirrors the reference SimpleTrainer.run_step (detectron2/engine/
train_loop.py:311-389): supervised detection losses on the paired batch, plus
— after a 10k-iteration burn-up — the image-level caption-consistency loss
(+ optional KD regularizer) and the region-level caption-consistency loss,
summed and SGD-stepped.

TPU-first deltas:
  * the reference computes the caption branches during burn-up and multiplies
    by 0.0 to keep DDP graphs identical across ranks; a jit program has no
    such constraint, so burn-up uses `lax.cond` — one compiled graph, and the
    caption compute is actually skipped while `step <= burnup`
  * gradient averaging across devices is implicit (batch sharded on the
    'data' mesh axis, params replicated — XLA inserts the reductions)
  * the NaN guard (reference train_loop.py:423-427 raising FloatingPointError)
    is a host-side check over the returned metrics in the Trainer.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.rcnn import DetBatch, GeneralizedRCNN
from ..solver.build import build_lr_schedule


def split_batch_stats(variables):
    """variables -> (differentiable collections, batch_stats or None).

    Models whose norm is SyncBN (RESNETS/FPN/ROI_*_HEAD NORM=SyncBN) carry
    running statistics in the flax 'batch_stats' collection inside
    state.params; the optimizer and grads see only the other collections."""
    if isinstance(variables, dict) and "batch_stats" in variables:
        diff = {k: v for k, v in variables.items() if k != "batch_stats"}
        return diff, variables["batch_stats"]
    return variables, None


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(split_batch_stats(params)[0]),
        )


def make_train_step(
    model: GeneralizedRCNN,
    optimizer: optax.GradientTransformation,
    enable_caption: bool = True,
    kd_regularization: bool = True,
    caption_burnup_iters: int = 10000,
    lr_schedule: Optional[Callable] = None,
    donate: bool = True,
    state_shardings: Optional[Any] = None,
    accum_steps: int = 1,
    consistency_branch: Optional[str] = None,
    consistency_weight: float = 1.0,
) -> Callable[[TrainState, DetBatch, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    `state_shardings` (a TrainState-shaped pytree of NamedShardings, e.g.
    parallel/fsdp.py fsdp_shardings) pins the OUTPUT state's layouts. FSDP
    needs this: without the constraint XLA may materialize updated params
    replicated, silently paying the memory FSDP exists to save and
    triggering a recompile on the next call (input shardings changed).

    `accum_steps` > 1 enables in-step gradient accumulation
    (SOLVER.ACCUM_STEPS): the batch's leading dim is split into
    `accum_steps` microbatches and a `lax.scan` accumulates grads/losses,
    so activation memory is per-microbatch while the optimizer sees the
    full-batch mean gradient — one logical iteration per call, so
    `state.step`, the LR schedule, burn-up gating and all hooks are
    unaffected. The reference has no counterpart (DDP scales by adding
    GPUs); here it lets IMS_PER_BATCH exceed what HBM fits per step.
    Note: losses that pool over the batch (the InfoNCE caption losses)
    see microbatch-sized negative pools under accumulation — the standard
    grad-accum semantics for contrastive objectives; the supervised
    detection losses use content-independent normalizers (images x
    sampler capacity) and decompose exactly."""

    def loss_fn(params, batch_stats, batch: DetBatch, rng: jax.Array, step: jnp.ndarray):
        variables = params
        mutable = False
        if batch_stats is not None:
            variables = dict(params)
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = model.apply(
            variables,
            batch,
            rng,
            step > caption_burnup_iters,
            kd_regularization,
            enable_caption,
            method=model.cddmsl_losses,
            mutable=mutable,
        )
        if batch_stats is not None:
            losses, mutated = out
            new_bs = mutated["batch_stats"]
        else:
            losses, new_bs = out, None
        if consistency_branch in ("image", "image_region"):
            # language-free InfoNCE branches (MODEL.CONSISTENCY_BRANCH,
            # reference rcnn.py:471-522), weighted and summed into the same
            # update — the reference adds them to the iteration's loss dict
            method = (
                model.image_consistency
                if consistency_branch == "image"
                else model.image_consistency_region
            )
            args = (batch,) if consistency_branch == "image" else (batch, jax.random.fold_in(rng, 7))
            # read-only batch_stats: the supervised forward already updated
            # them this step (SyncBN models); FrozenBN models have none
            extra = model.apply(variables, *args, method=method)
            losses = dict(losses)
            for k, v in extra.items():
                losses[f"{consistency_branch}_{k}"] = v * consistency_weight
        total = jnp.sum(jnp.stack([v for v in losses.values()]))
        return total, (losses, new_bs)

    def grads_and_losses(diff_params, batch_stats, step, batch: DetBatch, rng: jax.Array):
        if accum_steps <= 1:
            (total, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                diff_params, batch_stats, batch, rng, step
            )
            return total, losses, grads, new_bs

        def to_micro(x):
            assert x.shape[0] % accum_steps == 0, (
                f"batch dim {x.shape[0]} not divisible by accum_steps={accum_steps}"
            )
            return x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:])

        micro = jax.tree_util.tree_map(to_micro, batch)
        rngs = jax.random.split(rng, accum_steps)
        first_mb = jax.tree_util.tree_map(lambda x: x[0], micro)
        _, (loss_shapes, _) = jax.eval_shape(
            loss_fn, diff_params, batch_stats, first_mb, rng, step
        )

        def body(carry, xs):
            mb, r = xs
            acc_t, acc_l, acc_g, bs = carry
            (t, (ls, new_bs)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                diff_params, bs, mb, r, step
            )
            return (
                acc_t + t,
                jax.tree_util.tree_map(jnp.add, acc_l, ls),
                jax.tree_util.tree_map(jnp.add, acc_g, g),
                new_bs,  # running stats roll forward across microbatches
            ), None

        init = (
            jnp.zeros((), jnp.float32),
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), loss_shapes),
            jax.tree_util.tree_map(jnp.zeros_like, diff_params),
            batch_stats,
        )
        (total, losses, grads, new_bs), _ = jax.lax.scan(body, init, (micro, rngs))
        inv = 1.0 / accum_steps
        scale = lambda t: jax.tree_util.tree_map(lambda x: x * inv, t)
        return total * inv, scale(losses), scale(grads), new_bs

    def train_step(state: TrainState, batch: DetBatch, rng: jax.Array):
        diff_params, batch_stats = split_batch_stats(state.params)
        total, losses, grads, new_bs = grads_and_losses(
            diff_params, batch_stats, state.step, batch, rng
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, diff_params)
        new_params = optax.apply_updates(diff_params, updates)
        if new_bs is not None:
            new_params = dict(new_params)
            new_params["batch_stats"] = new_bs
        metrics = dict(losses)
        metrics["total_loss"] = total
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt_state)
        return new_state, metrics

    kwargs = {}
    if state_shardings is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = jax.tree_util.tree_leaves(state_shardings)[0].mesh
        # metrics are scalars -> replicated (a prefix leaf covers the dict)
        kwargs["out_shardings"] = (state_shardings, NamedSharding(mesh, PartitionSpec()))
    return jax.jit(train_step, donate_argnums=(0,) if donate else (), **kwargs)


def make_eval_step(model: GeneralizedRCNN):
    """Jitted inference step: (params, batch) -> DetectionResult."""

    def eval_step(params, batch: DetBatch):
        return model.apply(params, batch, method=model.inference)

    return jax.jit(eval_step)


def make_eval_step_quant(model: GeneralizedRCNN, qblocks, act_scales):
    """Jitted int8-res5 inference step (quant/ptq.py serving-path PTQ).
    The quant pytrees are closed over as constants so XLA folds the weight
    layout/dequant setup into the executable."""

    def eval_step(params, batch: DetBatch):
        return model.apply(
            params, batch, True, (qblocks, act_scales), method=model.inference
        )

    return jax.jit(eval_step)


def make_calib_step(model: GeneralizedRCNN):
    """Jitted (params, batch) -> pooled res4 crops for PTQ calibration."""

    def calib_step(params, batch: DetBatch):
        return model.apply(params, batch, method=model.res5_calib_inputs)

    return jax.jit(calib_step)


def make_caption_pl_step(
    model: GeneralizedRCNN,
    caption_model,
    caption_params,
    optimizer: optax.GradientTransformation,
    level: str = "img",  # 'img' (rcnn.py:556 caption_pl_img) or 'region' (:565)
    loss_type: str = "pseudo_label",  # or 'kl' (unsupervised_loss)
    max_len: int = 20,
    loss_weight: float = 1.0,
):
    """Optional pseudo-label caption step (the reference's caption_pl_img /
    caption_pl_region branches, wired as a SEPARATE jitted step so the
    scan-decode never burdens the default training graph). The ClipCap model
    (mapper + GPT-2) is frozen: gradients flow only into the detector
    backbone through the target-view prefix."""
    from ..models.caption import pseudo_labeling_loss, unsupervised_kl_loss

    loss_fn_inner = pseudo_labeling_loss if loss_type == "pseudo_label" else unsupervised_kl_loss

    def loss_fn(params, batch: DetBatch, rng: jax.Array):
        if level == "img":
            p_src, p_trgt = model.apply(params, batch, method=model.caption_pl_prefixes)
        else:
            p_src, p_trgt = model.apply(params, batch, rng, method=model.caption_pl_region_prefixes)
        loss = loss_fn_inner(caption_model, caption_params, p_src, p_trgt, max_len=max_len)
        return loss * loss_weight

    def pl_step(state: TrainState, batch: DetBatch, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        name = "token-pl_loss" if level == "img" else "token-pl-region_loss"
        # NOT step+1: when interleaved with the main step (DefaultTrainer
        # with MODEL.CONSISTENCY_BRANCH=caption_pl_*) the iteration counter,
        # LR schedule and burn-up gating must advance once per iteration
        return (
            state.replace(params=new_params, opt_state=new_opt_state),
            {name: loss},
        )

    return jax.jit(pl_step)
