"""Mean-teacher (Adaptive-Teacher-style) semi-supervised trainer.

Reconstructs the behavior of the reference's MISSING `rcnn_mt.py`
(`DAobjTwoStagePseudoLabGeneralizedRCNN`, imported at meta_arch/__init__.py:14
but absent from the repo — SURVEY.md §2.1) from its surviving pieces:
  * config keys `add_ateacher_config` (config/config.py:13-58):
    BBOX_THRESHOLD .8, BURN_UP_STEP, EMA_KEEP_RATE .9996, UNSUP_LOSS_WEIGHT
    .5, DIS_TYPE res4, DIS_LOSS_WEIGHT .1
  * the two-crop loaders (build.py:653-781) and strong/weak mappers
  * `PseudoLabRPN` / `CLIPRes5ROIHeadsPseudoLab` (losses on pseudo boxes;
    box-regression terms are excluded on pseudo-labeled data)
  * `EnsembleModel` teacher/student pair (ensemble_model.py:6-16)

Loop semantics: burn-up trains the student supervised on labeled data; at the
burn-up boundary the teacher snapshots the student; afterwards the teacher
(EMA, jitted pytree lerp) pseudo-labels the WEAK unlabeled view at threshold
0.8 and the student trains on labeled data + the STRONG unlabeled view with
UNSUP_LOSS_WEIGHT, plus a gradient-reversal domain discriminator on res4.

All of it — pseudo-label inference, thresholding, EMA update, both loss
sets — is ONE jitted program with `lax.cond` phase gating.
"""

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from ..config import CfgNode
from ..models import build_model
from ..models.rcnn import DetBatch
from ..parallel import mesh_from_cfg, replicate, shard_batch
from ..solver import build_lr_schedule, build_optimizer
from ..utils.events import CommonMetricPrinter, EventStorage, JSONWriter
from .defaults import DefaultTrainer
from .train_loop import make_eval_step

logger = logging.getLogger(__name__)


# ---------------- gradient reversal ----------------
@jax.custom_vjp
def grad_reverse(x):
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (-g,)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class FCDiscriminator(nn.Module):
    """Per-location domain classifier on res4 (the DIS_TYPE='res4' head the
    AT architecture attaches; 3 convs + leaky ReLU -> 1 logit map)."""

    ndf: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i, ch in enumerate((self.ndf, self.ndf // 2)):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i+1}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="classifier")(x)


class MTState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # student
    teacher_params: Any
    dis_params: Any
    opt_state: Any
    dis_opt_state: Any


def _bce_with_logits(logits, target):
    return jnp.mean(jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class MeanTeacherTrainer(DefaultTrainer):
    """Drop-in trainer selected by cfg.SEMISUPNET.Trainer == 'ateacher'."""

    def __init__(self, cfg: CfgNode):
        super().__init__(cfg)
        self.discriminator = FCDiscriminator(dtype=jnp.float32)
        feat = jnp.zeros((1, 8, 8, self.model.backbone_width * 16), jnp.float32)
        self.dis_params = self.discriminator.init(jax.random.PRNGKey(1), feat)
        self.dis_optimizer = optax.sgd(build_lr_schedule(cfg), momentum=cfg.SOLVER.MOMENTUM)
        _copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # un-alias for donation
        self.mt_state = MTState(
            step=jnp.zeros((), jnp.int32),
            params=self.state.params,
            teacher_params=_copy(self.state.params),
            dis_params=self.dis_params,
            opt_state=self.state.opt_state,
            dis_opt_state=self.dis_optimizer.init(self.dis_params),
        )
        self.mt_step = self._make_step()

    def resume_or_load(self, resume: bool = True):
        if resume and self.checkpointer.has_checkpoint():
            # native checkpoints of this trainer are MTState-shaped
            self.mt_state = self.checkpointer.load_native(
                self.checkpointer.get_checkpoint_file(), self.mt_state
            )
            self.start_iter = int(jax.device_get(self.mt_state.step))
            return
        super().resume_or_load(resume)
        self.mt_state = self.mt_state.replace(
            params=self.state.params,
            teacher_params=jax.tree_util.tree_map(jnp.array, self.state.params),
            step=self.state.step,
        )

    def compute_val_loss(self, batch: DetBatch, rng: Optional[jax.Array] = None):
        """Supervised losses on a labeled val batch WITHOUT a gradient step
        (the reference's compute_val_loss path through
        CLIPRes5ROIHeadsPseudoLab/PseudoLabRPN, clip_roi_heads.py:581-775):
        used to monitor val loss during mean-teacher training."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if not hasattr(self, "_val_loss_fn"):
            model = self.model

            @jax.jit
            def _fn(params, b, r):
                return model.apply(params, b, r, method=model.supervised_losses)

            self._val_loss_fn = _fn
        return {
            k: float(v)
            for k, v in jax.device_get(
                self._val_loss_fn(self.mt_state.params, batch, rng)
            ).items()
        }

    def _pseudo_label(self, teacher_params, weak_batch: DetBatch):
        """Teacher inference on the weak view -> thresholded pseudo GT
        (reference SEMISUPNET.BBOX_THRESHOLD, PSEUDO_BBOX_SAMPLE='thresholding')."""
        det = self.model.apply(teacher_params, weak_batch, False, method=self.model.inference)
        keep = det.valid & (det.scores > self.cfg.SEMISUPNET.BBOX_THRESHOLD)
        g = self.cfg.TPU.MAX_GT_BOXES
        boxes = det.boxes[:, :g]
        classes = det.classes[:, :g]
        valid = keep[:, :g]
        return boxes, classes, valid

    def _make_step(self):
        cfg = self.cfg
        model = self.model
        disc = self.discriminator
        optimizer = self.optimizer
        dis_optimizer = self.dis_optimizer
        burn_up = cfg.SEMISUPNET.BURN_UP_STEP
        w_unsup = cfg.SEMISUPNET.UNSUP_LOSS_WEIGHT
        w_sup = cfg.SEMISUPNET.SUP_LOSS_WEIGHT
        w_dis = cfg.SEMISUPNET.DIS_LOSS_WEIGHT
        ema_keep = cfg.SEMISUPNET.EMA_KEEP_RATE
        update_every = cfg.SEMISUPNET.TEACHER_UPDATE_ITER

        def step_fn(state: MTState, label_s: DetBatch, label_w: DetBatch,
                    unlabel_s: DetBatch, unlabel_w: DetBatch, rng: jax.Array):
            past_burnup = state.step > burn_up
            # pseudo labels from the (stop-gradient) teacher on the weak view
            pboxes, pclasses, pvalid = self._pseudo_label(
                jax.lax.stop_gradient(state.teacher_params), unlabel_w
            )
            pseudo_batch = unlabel_s._replace(
                gt_boxes=pboxes, gt_classes=pclasses, gt_valid=pvalid
            )

            def loss_fn(params, dis_params):
                k1, k2, k3 = jax.random.split(rng, 3)
                sup = model.apply(params, label_s, k1, method=model.supervised_losses)
                losses = {k: w_sup * v for k, v in sup.items()}

                def unsup_on(_):
                    u = model.apply(params, pseudo_batch, k2, method=model.supervised_losses)
                    # box-regression terms are excluded on pseudo labels
                    # (PseudoLabRPN/CLIPRes5ROIHeadsPseudoLab semantics)
                    return u["loss_cls"], u["loss_rpn_cls"]

                def unsup_off(_):
                    return jnp.zeros(()), jnp.zeros(())

                u_cls, u_rpn = jax.lax.cond(past_burnup, unsup_on, unsup_off, None)
                losses["loss_cls_pseudo"] = w_unsup * u_cls
                losses["loss_rpn_cls_pseudo"] = w_unsup * u_rpn

                def dis_on(_):
                    f_src = model.apply(params, label_s.image, method=model.extract_res4)
                    f_tgt = model.apply(params, unlabel_s.image, method=model.extract_res4)
                    d_src = disc.apply(dis_params, grad_reverse(f_src))
                    d_tgt = disc.apply(dis_params, grad_reverse(f_tgt))
                    return _bce_with_logits(d_src, jnp.zeros_like(d_src)) + _bce_with_logits(
                        d_tgt, jnp.ones_like(d_tgt)
                    )

                loss_dis = jax.lax.cond(past_burnup, dis_on, lambda _: jnp.zeros(()), None)
                losses["loss_D"] = w_dis * loss_dis
                total = jnp.sum(jnp.stack(list(losses.values())))
                return total, losses

            (total, losses), (grads, dis_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.dis_params)

            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            dis_updates, dis_opt_state = dis_optimizer.update(
                dis_grads, state.dis_opt_state, state.dis_params
            )
            dis_params = optax.apply_updates(state.dis_params, dis_updates)

            # teacher EMA (pytree lerp): snapshot at the burn-up boundary,
            # EMA every `update_every` afterwards
            at_boundary = state.step == burn_up
            do_ema = past_burnup & (jnp.mod(state.step, update_every) == 0)
            rate = jnp.where(at_boundary, 0.0, jnp.where(do_ema, ema_keep, 1.0))
            teacher = jax.tree_util.tree_map(
                lambda t, s: rate * t + (1.0 - rate) * s
                if jnp.issubdtype(jnp.asarray(t).dtype, jnp.floating)
                else s,
                state.teacher_params,
                params,
            )

            metrics = dict(losses)
            metrics["total_loss"] = total
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                teacher_params=teacher,
                dis_params=dis_params,
                opt_state=opt_state,
                dis_opt_state=dis_opt_state,
            )
            return new_state, metrics

        return jax.jit(step_fn, donate_argnums=(0,))

    def train(self):
        cfg = self.cfg
        from ..data import build_semisup_train_loader_two_crops

        loader = build_semisup_train_loader_two_crops(cfg, seed=max(cfg.SEED, 0))
        state = replicate(self.mt_state, self.mesh)
        spatial = (
            "model"
            if (cfg.TPU.SPATIAL_PARTITION and "model" in self.mesh.axis_names)
            else None
        )
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 999)
        from ..parallel import multihost

        writers = [CommonMetricPrinter(self.max_iter)]
        if multihost.is_main_process():  # shared OUTPUT_DIR: one file writer
            writers.append(JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")))
        multihost.synchronize()  # absorb per-host setup skew pre-dispatch
        # see engine/defaults.py train(): gloo-clique creation window on the
        # CPU-emulation backend requires draining each step
        drain_each_step = jax.process_count() > 1 and jax.default_backend() == "cpu"
        if drain_each_step:
            # compile-then-barrier-then-dispatch for the first MT step
            import itertools

            first = next(loader)
            (fls, flw), (fus, fuw) = first
            wb = [shard_batch(b, self.mesh, spatial_axis=spatial) for b in (fls, flw, fus, fuw)]
            multihost.warm_and_align(
                self.mt_step, state, *wb, jax.random.fold_in(rng, self.start_iter)
            )
            loader = itertools.chain([first], loader)
        log_period = 20
        with EventStorage(self.start_iter) as storage:
            t0 = time.time()
            with jax.sharding.set_mesh(self.mesh):
                for it in range(self.start_iter, self.max_iter):
                    (ls, lw), (us, uw) = next(loader)
                    ls, lw, us, uw = (
                        shard_batch(b, self.mesh, spatial_axis=spatial)
                        for b in (ls, lw, us, uw)
                    )
                    state, metrics = self.mt_step(state, ls, lw, us, uw, jax.random.fold_in(rng, it))
                    if drain_each_step:
                        jax.block_until_ready(metrics)
                    if (it + 1) % log_period == 0:
                        host = jax.device_get(metrics)
                        if not np.isfinite(float(host["total_loss"])):
                            raise FloatingPointError(f"NaN/Inf loss at iter {it}: {host}")
                        storage.put_scalar("time", (time.time() - t0) / log_period, smoothing_hint=False)
                        t0 = time.time()
                        for k, v in host.items():
                            storage.put_scalar(k, float(v))
                        for w in writers:
                            w.write(storage)
                    if cfg.SOLVER.CHECKPOINT_PERIOD and (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                        self.checkpointer.save(f"model_{it:07d}", jax.device_get(state))
                    if cfg.TEST.EVAL_PERIOD and (it + 1) % cfg.TEST.EVAL_PERIOD == 0:
                        host_state = jax.device_get(state)
                        logger.info("=== student eval ===")
                        self.test(cfg, host_state)
                        logger.info("=== teacher eval ===")
                        self.test(cfg, host_state.replace(params=host_state.teacher_params))
                    storage.step()
        self.mt_state = jax.device_get(state)
        self.checkpointer.save("model_final", self.mt_state)
        for w in writers:
            w.close()
        if not cfg.DATASETS.TEST:
            return {}
        # final TEACHER eval (the reference reports the EMA teacher) +
        # golden verification (reference defaults.py:497-501)
        results = self.test(
            cfg, self.mt_state.replace(params=self.mt_state.teacher_params)
        )
        self._verify_final(results)
        self._verify_pseudo_labels()
        return results

    def pseudo_label_stats(self):
        """(count, precision) of the FINAL teacher's thresholded
        pseudo-labels on the first weak unlabeled batch, scored against the
        batch's own GT (IoU>0.5, same class). The quality signal of the
        EMA/threshold loop that the AP pin alone can miss."""
        from ..data import build_semisup_train_loader_two_crops

        loader = build_semisup_train_loader_two_crops(self.cfg, seed=max(self.cfg.SEED, 0))
        (_, _), (_, unlabel_w) = next(loader)
        boxes, classes, valid = self._pseudo_label(
            self.mt_state.teacher_params, unlabel_w
        )
        boxes, classes, valid = map(np.asarray, (boxes, classes, valid))
        gtb = np.asarray(unlabel_w.gt_boxes)
        gtc = np.asarray(unlabel_w.gt_classes)
        gtv = np.asarray(unlabel_w.gt_valid)
        n_pseudo = n_correct = 0
        for b in range(len(boxes)):
            pb, pc = boxes[b][valid[b]], classes[b][valid[b]]
            gb, gc = gtb[b][gtv[b]], gtc[b][gtv[b]]
            n_pseudo += len(pb)
            if not len(gb):
                continue
            for box, cls in zip(pb, pc):
                lt = np.maximum(box[:2], gb[:, :2])
                rb = np.minimum(box[2:], gb[:, 2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[:, 0] * wh[:, 1]
                area = (
                    (box[2] - box[0]) * (box[3] - box[1])
                    + (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
                    - inter
                )
                iou = inter / np.maximum(area, 1e-9)
                if np.any((iou > 0.5) & (gc == cls)):
                    n_correct += 1
        return n_pseudo, n_correct / max(n_pseudo, 1)

    def _verify_pseudo_labels(self):
        """SEMISUPNET.EXPECTED_PSEUDO golden (config/ateacher.py): exact
        pseudo count + precision within tolerance."""
        expected = list(self.cfg.SEMISUPNET.EXPECTED_PSEUDO)
        if not expected:
            return
        want_count, want_prec, tol = expected
        count, prec = self.pseudo_label_stats()
        logger.info(
            "Pseudo-label golden: count=%d (want %d), precision=%.4f (want %.4f+-%.2f)",
            count, int(want_count), prec, want_prec, tol,
        )
        assert count == int(want_count) and abs(prec - want_prec) <= tol, (
            f"Pseudo-label verification failed: count={count} (want {int(want_count)}), "
            f"precision={prec:.4f} (want {want_prec}+-{tol})"
        )
