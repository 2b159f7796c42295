"""Default training/eval orchestration + CLI plumbing.

Mirrors the reference engine surface (detectron2/engine/defaults.py):
`default_argument_parser` (:82), `default_setup` (:197), `DefaultTrainer`
(:322-715) — build model/optimizer/loaders, resume-or-load (including the
CDDMSL side-loads: offline RegionCLIP backbone from PRE_TRAINED_RCLIP_PATH
(train_loop.py:150-164), frozen ClipCap mapper from VISION_TO_LANG_PATH
(train_loop.py:281-288), text-embedding classifier from TEXT_EMB_PATH
(fast_rcnn.py:448-452)), the hot loop with periodic logging / eval /
checkpointing and the NaN guard (train_loop.py:423-427), and `Trainer.test`
over all DATASETS.TEST with the Watercolor/Comic 6-class subset rule
(train_net.py:102-103).

There is no `launch()` / process-per-GPU: one process drives the whole mesh.
"""

import argparse
import logging
import os
import time
import weakref
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import (
    DetectionCheckpointer,
    load_clipcap_mapper,
    load_offline_backbone,
    load_text_emb_classifier,
)
from ..config import CfgNode
from ..data import (
    MetadataCatalog,
    build_detection_test_loader,
    build_detection_train_loader,
    register_all,
)
from ..evaluation import PascalVOCDetectionEvaluator, inference_on_dataset, print_csv_format
from ..models import build_model
from ..models.rcnn import DetBatch
from ..parallel import mesh_from_cfg, replicate, shard_batch
from ..solver import build_lr_schedule, build_optimizer
from ..utils.events import CommonMetricPrinter, EventStorage, JSONWriter, TensorboardXWriter
from .train_loop import TrainState, make_eval_step, make_train_step, split_batch_stats

logger = logging.getLogger(__name__)


def default_argument_parser():
    """reference engine/defaults.py:82. `--num-machines/--machine-rank/
    --dist-url` launch multi-HOST execution (one process per host driving its
    local chips, jax.distributed under the hood — parallel/multihost.py);
    `--num-gpus` (process-per-device) has no TPU analogue and is accepted
    for CLI compat only."""
    parser = argparse.ArgumentParser(description="cddmsl_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=0, help="accepted for CLI compat; ignored (the mesh uses all devices)")
    parser.add_argument("--num-machines", type=int, default=1, help="number of hosts (processes); >1 wires jax.distributed")
    parser.add_argument("--machine-rank", type=int, default=0, help="this host's process index")
    parser.add_argument("--dist-url", default="auto", help="coordinator tcp://host:port ('auto' on TPU pods)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def default_setup(cfg: CfgNode, args=None):
    from ..parallel import multihost

    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    if cfg.SEED >= 0:
        np.random.seed(cfg.SEED)
    if multihost.is_main_process():  # shared OUTPUT_DIR: one writer
        try:
            cfg.dump_to_file(os.path.join(output_dir, "config.yaml"))
        except Exception:
            pass
    logger.info(
        "process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def _init_batch(cfg) -> DetBatch:
    """Small synthetic batch for flax param init (shapes of params do not
    depend on image size)."""
    b, h, w, g = 1, 128, 160, 4
    return DetBatch(
        image=jnp.zeros((b, h, w, 3), jnp.float32),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        orig_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 64, 64]] + [[0, 0, 0, 0]] * (g - 1)], jnp.float32),
        gt_classes=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.asarray([[True] + [False] * (g - 1)]),
        image_trgt=jnp.zeros((b, h, w, 3), jnp.float32),
        gt_masks=(
            jnp.zeros((b, g, h // cfg.TPU.MASK_CANVAS_STRIDE, w // cfg.TPU.MASK_CANVAS_STRIDE), jnp.float32)
            if cfg.MODEL.MASK_ON
            else None
        ),
        gt_keypoints=(
            jnp.zeros((b, g, cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS, 3), jnp.float32)
            if cfg.MODEL.KEYPOINT_ON
            else None
        ),
        proposal_boxes=(
            jnp.asarray([[[8, 8, 64, 64]] * cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN], jnp.float32)
            if cfg.MODEL.LOAD_PROPOSALS
            else None
        ),
        proposal_scores=(
            jnp.zeros((b, cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN), jnp.float32)
            if cfg.MODEL.LOAD_PROPOSALS
            else None
        ),
        proposal_valid=(
            jnp.ones((b, cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN), bool)
            if cfg.MODEL.LOAD_PROPOSALS
            else None
        ),
    )


def build_evaluator(cfg, dataset_name: str):
    """reference tools/train_net.py:68-115 build_evaluator."""
    meta = MetadataCatalog.get(dataset_name)
    ev_type = meta.get("evaluator_type", "pascal_voc")
    if ev_type == "pascal_voc":
        target = None
        if dataset_name in ("Watercolor_test", "Comic_test", "Watercolor_train", "Comic_train"):
            from ..data.datasets.voc import ARTISTIC_6_CLASSES

            target = ARTISTIC_6_CLASSES
        return PascalVOCDetectionEvaluator(dataset_name, target_classnames=target)
    if ev_type == "coco":
        from ..evaluation.coco_eval import COCOEvaluator

        tasks = ("bbox",)
        if cfg.MODEL.MASK_ON:
            tasks += ("segm",)
        if cfg.MODEL.KEYPOINT_ON:
            tasks += ("keypoints",)
        # prediction dump (reference: OUTPUT_DIR/inference/coco_instances_results.json)
        out_json = (
            os.path.join(cfg.OUTPUT_DIR, "inference", f"coco_instances_results_{dataset_name}.json")
            if cfg.OUTPUT_DIR
            else None
        )
        return COCOEvaluator(
            dataset_name, tasks=tasks, output_json=out_json,
            kpt_oks_sigmas=(list(cfg.TEST.KEYPOINT_OKS_SIGMAS) or None),
        )
    if ev_type == "lvis":
        from ..evaluation.lvis_eval import LVISEvaluator

        return LVISEvaluator(dataset_name)
    if ev_type == "cityscapes_instance":
        from ..evaluation.cityscapes_eval import CityscapesInstanceEvaluator

        # mask-level AP (the published cityscapesscripts metric) when the
        # model produces masks; bbox proxy (with a warning) otherwise
        return CityscapesInstanceEvaluator(
            dataset_name, tasks=("segm",) if cfg.MODEL.MASK_ON else ("bbox",)
        )
    if ev_type == "sem_seg":
        from ..evaluation.sem_seg_eval import SemSegEvaluator

        return SemSegEvaluator(dataset_name)
    if ev_type in ("coco_panoptic_seg", "cityscapes_panoptic_seg"):
        # PQ/SQ/RQ (reference tools/train_net.py builds COCOPanopticEvaluator
        # for this type; fed by inference_on_dataset_panoptic, which
        # host-combines PanopticFPN's (instances, sem_seg) output)
        from ..evaluation.panoptic_eval import COCOPanopticEvaluator

        return COCOPanopticEvaluator(dataset_name, output_dir=cfg.OUTPUT_DIR or None)
    if ev_type == "rotated_coco":
        from ..evaluation.rotated_coco_eval import RotatedCOCOEvaluator

        return RotatedCOCOEvaluator(dataset_name)
    raise NotImplementedError(f"evaluator type {ev_type}")


def launch(main_func, num_gpus_per_machine=0, num_machines=1, machine_rank=0, dist_url=None, args=()):
    """The reference engine.launch (launch.py:27-125) re-mapped to the JAX
    execution model. The reference spawns one process per GPU
    (mp.spawn + init_process_group); on TPU one process per HOST drives all
    of that host's chips, so there is no intra-host spawning —
    `num_gpus_per_machine` is accepted for CLI compat and ignored. With
    `num_machines > 1` this wires `jax.distributed.initialize` (coordinator
    at `dist_url`, this host at `machine_rank`) before invoking main; every
    host must call launch() with the same arguments (the pod scheduler's
    per-host command), after which `jax.devices()` spans the whole pod and
    the mesh/jit programs in main_func drive it as one SPMD program."""
    from ..parallel import multihost

    multihost.initialize(num_machines=num_machines, machine_rank=machine_rank, dist_url=dist_url)
    return main_func(*args)


class DefaultPredictor:
    """Single-image inference convenience (reference defaults.py:253):
    resizes per cfg.INPUT.MIN/MAX_SIZE_TEST, pads to the test bucket, runs the
    jitted inference, returns detections in original-image coords."""

    def __init__(self, cfg: CfgNode, trainer: Optional["DefaultTrainer"] = None):
        self.cfg = cfg
        self.trainer = trainer or DefaultTrainer(cfg)
        if trainer is None:
            self.trainer.resume_or_load(resume=False)
        from ..data.dataset_mapper import DatasetMapper
        self.mapper = DatasetMapper(cfg, is_train=False)

    def __call__(self, original_image: np.ndarray):
        from ..data.build import pad_and_collate
        from ..data.transforms import ResizeShortestEdge, apply_augmentations

        img, _ = apply_augmentations(
            [ResizeShortestEdge(self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST)],
            original_image,
            np.random.RandomState(0),
        )
        h, w = img.shape[:2]
        pad_hw = tuple(self.cfg.TPU.PAD_SIZE_TEST)
        key = (min(pad_hw), max(pad_hw)) if w >= h else (max(pad_hw), min(pad_hw))
        batch = pad_and_collate(
            [{"image": img, "orig_hw": np.asarray(original_image.shape[:2], np.int32),
              "boxes": np.zeros((0, 4), np.float32), "classes": np.zeros((0,), np.int32)}],
            key,
            self.cfg.TPU.MAX_GT_BOXES,
            with_trgt=False,
        )
        det = self.trainer.eval_step(self.trainer.state.params, batch)
        import jax as _jax

        det = _jax.device_get(det)
        keep = det.valid[0]
        out = {
            "boxes": np.asarray(det.boxes[0])[keep],
            "scores": np.asarray(det.scores[0])[keep],
            "classes": np.asarray(det.classes[0])[keep],
        }
        if det.masks is not None:
            # paste box-space mask probs into original-image space (MASK_ON)
            from ..evaluation.masks import paste_masks_np

            out["masks"] = paste_masks_np(
                np.asarray(det.masks[0])[keep], out["boxes"], original_image.shape[:2]
            )
        return out


class _SyncedPeriodicCheckpointer:
    """PeriodicCheckpointer that pulls the live device state to host before
    saving (the loop keeps `trainer.state` as device arrays mid-train)."""

    trainer = None

    def __init__(self, checkpointer, period: int):
        self._ckptr = checkpointer
        self._period = period

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        it = self.trainer.storage.iter
        if self._period and (it + 1) % self._period == 0:
            # pass the live device state: save() fetches to host (or runs the
            # collective multi-host path) itself
            self._ckptr.save(f"model_{it:07d}", self.trainer.state)


class DefaultTrainer:
    def __init__(self, cfg: CfgNode):
        register_all()
        self.cfg = cfg
        self.mesh = mesh_from_cfg(cfg)
        self.model = build_model(cfg)

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        init_b = _init_batch(cfg)
        if cfg.TPU.FAST_INIT:
            # tests/dryrun: structure-only params, no forward execution
            from ..utils.testing import materialize_params

            params = materialize_params(
                lambda r, b: self.model.init({"params": r}, b, r, method=self.model.init_all),
                rng, init_b,
            )
        else:
            params = self.model.init({"params": rng}, init_b, rng, method=self.model.init_all)
        # mask/opt-state cover the differentiable collections only; SyncBN
        # running stats ('batch_stats', when RESNETS/FPN/ROI_*_HEAD NORM is
        # SyncBN) ride inside state.params but are updated by the forward
        # pass, not the optimizer (train_loop.py split_batch_stats)
        self.optimizer = build_optimizer(cfg, split_batch_stats(params)[0])
        self.state = TrainState.create(params, self.optimizer)

        self.lr_schedule = build_lr_schedule(cfg)
        branch = cfg.MODEL.CONSISTENCY_BRANCH
        assert branch in ("", "image", "image_region", "caption_pl_img", "caption_pl_region"), branch
        self.train_step = make_train_step(
            self.model,
            self.optimizer,
            enable_caption=cfg.TPU.ENABLE_CAPTION_CONSISTENCY,
            kd_regularization=cfg.MODEL.KD_REGULRAZIATION,
            caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
            lr_schedule=self.lr_schedule,
            accum_steps=cfg.SOLVER.ACCUM_STEPS,
            consistency_branch=branch if branch in ("image", "image_region") else None,
            consistency_weight=cfg.MODEL.CONSISTENCY_LOSS_WEIGHT,
        )
        self.caption_pl_step = (
            self._build_caption_pl_step(cfg) if branch.startswith("caption_pl") else None
        )
        # open-set test head (reference fast_rcnn.py:466-475): evaluate with
        # a different (usually larger) class vocabulary whose text embeddings
        # come from OPENSET_TEST_TEXT_EMB_PATH; box deltas must be
        # class-agnostic for the K-swap to be well-defined
        self._openset = bool(cfg.MODEL.CLIP.OPENSET_TEST_NUM_CLASSES)
        if self._openset:
            assert cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG, (
                "OPENSET_TEST_NUM_CLASSES requires CLS_AGNOSTIC_BBOX_REG"
            )
            eval_cfg = cfg.clone()
            eval_cfg.defrost()
            eval_cfg.MODEL.ROI_HEADS.NUM_CLASSES = cfg.MODEL.CLIP.OPENSET_TEST_NUM_CLASSES
            eval_cfg.freeze()
            self.eval_model = build_model(eval_cfg)
        else:
            self.eval_model = self.model
        self.eval_step = make_eval_step(self.eval_model)
        self.checkpointer = DetectionCheckpointer(
            cfg.OUTPUT_DIR,
            async_save=cfg.TPU.ASYNC_CHECKPOINT,
            max_to_keep=cfg.SOLVER.CHECKPOINT_MAX_TO_KEEP,
        )
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self._data_loader = None

    def _build_caption_pl_step(self, cfg):
        """MODEL.CONSISTENCY_BRANCH=caption_pl_img|caption_pl_region
        (reference rcnn.py:556-591): build the frozen ClipCap decoder
        (mapper + GPT-2, dims from TPU.GPT2_* / V2L_MAPPER_TOKENS; weights
        from VISION_TO_LANG_PATH / CAPTION_GPT2_PATH when set) and the
        separate jitted pseudo-label step. Run by train() after each main
        step — a second optimizer update per iteration, vs the reference's
        summed single backward (documented deviation: keeps the scan-decode
        out of the default training graph)."""
        import jax.numpy as jnp

        from ..models.caption import ClipCaptionModel
        from ..models.gpt2 import GPT2Config
        from .train_loop import make_caption_pl_step

        embed = cfg.TPU.EMBED_DIM or {50: 1024, 101: 512}.get(cfg.MODEL.RESNETS.DEPTH, 1024)
        gcfg = GPT2Config(
            vocab_size=cfg.TPU.GPT2_VOCAB,
            n_positions=cfg.TPU.GPT2_POSITIONS,
            n_embd=cfg.TPU.GPT2_EMBD,
            n_layer=cfg.TPU.GPT2_LAYERS,
            n_head=cfg.TPU.GPT2_HEADS,
        )
        cap = ClipCaptionModel(
            prefix_length=cfg.TPU.V2L_MAPPER_TOKENS,
            clip_length=cfg.TPU.V2L_MAPPER_TOKENS,
            dim_clip=embed,
            gpt_config=gcfg,
        )
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 41)
        toks = jnp.zeros((1, 4), jnp.int32)
        pfx = jnp.zeros((1, embed), jnp.float32)
        if cfg.TPU.FAST_INIT:
            from ..utils.testing import materialize_params

            cap_params = materialize_params(lambda r: cap.init(r, toks, pfx), rng)
        else:
            cap_params = cap.init(rng, toks, pfx)
        if cfg.MODEL.VISION_TO_LANG_PATH:
            from ..checkpoint.convert_torch import convert_clipcap_mapper, load_torch_state_dict

            sd = load_torch_state_dict(cfg.MODEL.VISION_TO_LANG_PATH)
            cap_params["params"]["clip_project"] = convert_clipcap_mapper(sd)
        if cfg.MODEL.CAPTION_GPT2_PATH:
            from ..checkpoint.convert_torch import load_torch_state_dict
            from ..models.gpt2 import convert_hf_gpt2

            sd = load_torch_state_dict(cfg.MODEL.CAPTION_GPT2_PATH)
            cap_params["params"]["gpt"] = convert_hf_gpt2(sd)["params"]
        cap_params = jax.tree_util.tree_map(jnp.asarray, cap_params)
        return make_caption_pl_step(
            self.model, cap, cap_params, self.optimizer,
            level="img" if cfg.MODEL.CONSISTENCY_BRANCH.endswith("img") else "region",
            loss_type=cfg.MODEL.CAPTION_PL_LOSS,
            max_len=cfg.MODEL.CAPTION_PL_MAX_LEN,
            loss_weight=cfg.MODEL.CONSISTENCY_LOSS_WEIGHT,
        )

    # ---- weight loading ----
    def resume_or_load(self, resume: bool = True):
        cfg = self.cfg
        self.state = self.checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, self.state, resume)
        if not (resume and self.checkpointer.has_checkpoint()):
            if cfg.MODEL.CLIP.TEXT_EMB_PATH:
                self.state = self.state.replace(
                    params=load_text_emb_classifier(self.state.params, cfg.MODEL.CLIP.TEXT_EMB_PATH)
                )
            if cfg.MODEL.VISION_TO_LANG_PATH:
                self.state = self.state.replace(
                    params=load_clipcap_mapper(self.state.params, cfg.MODEL.VISION_TO_LANG_PATH)
                )
            if cfg.MODEL.PRE_TRAINED_RCLIP_PATH:
                self.state = self.state.replace(
                    params=load_offline_backbone(self.state.params, cfg.MODEL.PRE_TRAINED_RCLIP_PATH)
                )
            if cfg.MODEL.CLIP.BB_RPN_WEIGHTS:
                # 2nd checkpoint for the frozen offline backbone+RPN
                # (reference engine/defaults.py:393-399 second_checkpointer)
                from ..checkpoint.convert_torch import load_bb_rpn_weights

                self.state = self.state.replace(
                    params=load_bb_rpn_weights(self.state.params, cfg.MODEL.CLIP.BB_RPN_WEIGHTS)
                )
        self.start_iter = int(jax.device_get(self.state.step))

    # ---- hooks (reference defaults.py:430-476 build_hooks + train_loop.py
    # TrainerBase.register_hooks/before_step/after_step) ----
    def build_hooks(self):
        from . import hooks as H

        from ..parallel import multihost

        cfg = self.cfg
        writers = [CommonMetricPrinter(self.max_iter)]
        if multihost.is_main_process():
            # shared OUTPUT_DIR under multi-host: only rank 0 writes files
            # (reference defaults.py build_writers guards the same way)
            writers += [
                JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
                TensorboardXWriter(cfg.OUTPUT_DIR),
            ]
        ret = [H.IterationTimer(), H.LRScheduler()]
        if cfg.SOLVER.CHECKPOINT_PERIOD:
            ret.append(_SyncedPeriodicCheckpointer(self.checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD))
        if cfg.TEST.EVAL_PERIOD:
            ret.append(H.EvalHook(cfg.TEST.EVAL_PERIOD, self._eval_into_storage))
        ret.append(H.PeriodicWriter(writers, period=20))
        return ret

    def register_hooks(self, hooks_list):
        for h in hooks_list:
            h.trainer = self
        self._hooks = list(hooks_list)

    def _eval_into_storage(self):
        results = self.test(self.cfg, self.state)
        for ds, res in results.items():
            for task, m in res.items():
                for k, v in m.items():
                    if "-" not in k:  # skip per-category keys (AP50-x, AP-x)
                        self.storage.put_scalar(f"{ds}/{task}/{k}", v, smoothing_hint=False)

    # ---- training ----
    def train(self):
        cfg = self.cfg
        if self._data_loader is None:
            self._data_loader = build_detection_train_loader(cfg, seed=max(cfg.SEED, 0))
        loader = self._data_loader
        if cfg.TPU.FSDP:
            # ZeRO-3-style placement: params + moments sharded over 'data'
            # (and, when the mesh also carries 'model', TP rules take
            # precedence per leaf) — parallel/fsdp.py. The step's output
            # state is pinned to the same layouts so the shards survive the
            # update (see make_train_step state_shardings).
            from ..parallel import fsdp_shardings, rules_from_cfg

            if jax.default_backend() == "cpu" and "concurrency_optimized" not in os.environ.get("XLA_FLAGS", ""):
                logger.warning(
                    "FSDP on the CPU (emulation) backend: set XLA_FLAGS="
                    "--xla_cpu_enable_concurrency_optimized_scheduler=false "
                    "— the default scheduler can launch FSDP's independent "
                    "all-gathers in divergent orders across virtual devices "
                    "and deadlock the collective rendezvous (TPU is "
                    "unaffected; it executes collectives in program order)."
                )
            tp_rules = rules_from_cfg(cfg) if "model" in self.mesh.axis_names else None
            shardings = fsdp_shardings(
                self.state, self.mesh, min_size=cfg.TPU.FSDP_MIN_SIZE, tp_rules=tp_rules
            )
            state = jax.device_put(self.state, shardings)
            self.train_step = make_train_step(
                self.model,
                self.optimizer,
                enable_caption=cfg.TPU.ENABLE_CAPTION_CONSISTENCY,
                kd_regularization=cfg.MODEL.KD_REGULRAZIATION,
                caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
                lr_schedule=self.lr_schedule,
                state_shardings=shardings,
                accum_steps=cfg.SOLVER.ACCUM_STEPS,
            )
        elif "model" in self.mesh.axis_names:
            # tensor-parallel placement: rule-based PartitionSpecs on the
            # params (and, by path match, their optimizer moments); the jit
            # step propagates the layouts (parallel/tp.py)
            from ..parallel import rules_from_cfg, shard_params

            state = shard_params(self.state, self.mesh, rules_from_cfg(cfg))
        else:
            state = replicate(self.state, self.mesh)
        spatial = (
            "model"
            if (cfg.TPU.SPATIAL_PARTITION and "model" in self.mesh.axis_names)
            else None
        )
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 12345)

        self.register_hooks(self.build_hooks())
        log_period = 20
        from ..parallel import multihost

        # multi-host: absorb per-host setup skew (init/compile happen
        # independently per process) BEFORE the first collective dispatch —
        # the CPU-emulation backend's gloo context init gives late ranks
        # only a 30 s window (parallel/multihost.py synchronize docstring)
        multihost.synchronize()
        # On that same backend, gloo cliques are also created lazily DURING
        # execution: with async dispatch two in-flight steps pipeline and
        # per-process execution skew on a shared core can exceed the 30 s
        # window at a new clique's rendezvous. Draining each step before
        # dispatching the next keeps ranks aligned while cliques form. TPU
        # collectives have no such window — keep full dispatch-ahead there.
        drain_each_step = jax.process_count() > 1 and jax.default_backend() == "cpu"
        if drain_each_step:
            # compile-then-barrier-then-dispatch for the first step: the
            # per-process COMPILE phase is the largest skew source
            import itertools

            first = next(loader)
            warm_batch = shard_batch(first, self.mesh, spatial_axis=spatial)
            warm_rng = jax.random.fold_in(rng, self.start_iter)
            multihost.warm_and_align(self.train_step, state, warm_batch, warm_rng)
            if self.caption_pl_step is not None:
                multihost.warm_and_align(
                    self.caption_pl_step, state, warm_batch, jax.random.fold_in(warm_rng, 1)
                )
            loader = itertools.chain([first], loader)
        logger.info("Starting training from iteration %d", self.start_iter)
        with EventStorage(self.start_iter) as storage:
            self.storage = storage
            for h in self._hooks:
                h.before_train()
            t_step = time.time()
            with jax.sharding.set_mesh(self.mesh):
                for it in range(self.start_iter, self.max_iter):
                    for h in self._hooks:
                        h.before_step()
                    batch = shard_batch(next(loader), self.mesh, spatial_axis=spatial)
                    step_rng = jax.random.fold_in(rng, it)
                    state, metrics = self.train_step(state, batch, step_rng)
                    if self.caption_pl_step is not None:
                        # MODEL.CONSISTENCY_BRANCH=caption_pl_*: interleaved
                        # pseudo-label caption update (reference rcnn.py:556-591)
                        state, pl_metrics = self.caption_pl_step(
                            state, batch, jax.random.fold_in(step_rng, 1)
                        )
                        metrics = {**metrics, **pl_metrics}
                    if drain_each_step:
                        jax.block_until_ready(metrics)
                    self.state = state  # hooks see the live (device) state

                    # metric ingestion stays inline: it is the jitted loop's
                    # host sync point and must run before PeriodicWriter
                    if (it + 1) % log_period == 0 or it == self.max_iter - 1:
                        host = jax.device_get(metrics)  # sync point
                        total = float(host["total_loss"])
                        if not np.isfinite(total):  # reference train_loop.py:423-427
                            raise FloatingPointError(
                                f"Loss became infinite or NaN at iteration={it}! metrics={host}"
                            )
                        now = time.time()
                        storage.put_scalar("time", (now - t_step) / log_period, smoothing_hint=False)
                        t_step = now
                        for k, v in host.items():
                            storage.put_scalar(k, float(v))
                    for h in self._hooks:
                        h.after_step()
                    storage.step()
            for h in self._hooks:
                h.after_train()
        self.state = state  # checkpointer.save handles host fetch / multi-host layout
        self.checkpointer.save("model_final", state)
        self.checkpointer.wait_until_finished()  # drain any in-flight async save
        if not cfg.DATASETS.TEST:
            return {}
        results = self.test(cfg, self.state)
        self._verify_final(results)
        return results

    # ---- evaluation ----
    def _maybe_precise_bn(self, cfg, params):
        """TEST.PRECISE_BN (reference engine/hooks.py:397 PreciseBN +
        fvcore update_bn_stats): before eval, re-estimate the SyncBN running
        statistics as the equal-weight mean of true per-batch statistics
        over NUM_ITER train batches. Applied to the eval-time params only
        (the training EMA keeps evolving from its own stats)."""
        if not cfg.TEST.PRECISE_BN.ENABLED:
            return params
        if not (isinstance(params, dict) and "batch_stats" in params):
            return params  # no SyncBN in this model
        from ..models.backbone.batch_norm import update_bn_stats

        loader = build_detection_train_loader(cfg, seed=max(cfg.SEED, 0) + 777)
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 778)

        @jax.jit
        def fwd(variables, batch):
            return self.model.apply(
                variables, batch, rng, False, True, False,
                method=self.model.cddmsl_losses, mutable=["batch_stats"],
            )

        n_iter = cfg.TEST.PRECISE_BN.NUM_ITER
        batches = (next(loader) for _ in range(n_iter))
        logger.info("PreciseBN: re-estimating batch_stats over %d batches", n_iter)
        return update_bn_stats(fwd, params, batches)

    def test(self, cfg=None, state=None) -> Dict[str, dict]:
        cfg = cfg or self.cfg
        state = state if state is not None else self.state
        params = state.params if hasattr(state, "params") else state
        params = self._maybe_precise_bn(cfg, params)
        if self._openset and cfg.MODEL.CLIP.OPENSET_TEST_TEXT_EMB_PATH:
            params = load_text_emb_classifier(params, cfg.MODEL.CLIP.OPENSET_TEST_TEXT_EMB_PATH)
        # mesh-sharded eval: round the eval batch up to a multiple of the
        # data-axis size and shard each batch over the mesh, so inference
        # rides every chip (the reference distributes eval via DDP +
        # InferenceSampler per rank; here it is one SPMD program). The
        # loader already pads the final partial batch by repetition, so
        # every batch divides evenly.
        dp = dict(self.mesh.shape).get("data", 1)
        eval_bs = cfg.MODEL.CLIP.IMS_PER_BATCH_TEST
        place_fn = None
        if dp > 1:
            eval_bs = ((eval_bs + dp - 1) // dp) * dp
            place_fn = lambda b: shard_batch(b, self.mesh)
        eval_step = self.eval_step
        if cfg.TPU.QUANT_EVAL:
            eval_step = self._build_quant_eval_step(cfg, params, eval_bs)
        from ..parallel import multihost

        multihost.synchronize()  # align hosts before the eval programs dispatch
        results = {}
        for dataset_name in cfg.DATASETS.TEST:
            loader, n = build_detection_test_loader(cfg, dataset_name, batch_size=eval_bs)
            evaluator = build_evaluator(cfg, dataset_name)
            from ..evaluation.panoptic_eval import COCOPanopticEvaluator
            from ..evaluation.sem_seg_eval import SemSegEvaluator

            if isinstance(evaluator, COCOPanopticEvaluator):
                # PanopticFPN eval: (instances, sem_seg) -> host combine ->
                # PQ (reference Trainer.test + COCOPanopticEvaluator)
                from ..evaluation.panoptic_eval import inference_on_dataset_panoptic

                comb = cfg.MODEL.PANOPTIC_FPN.COMBINE
                res = inference_on_dataset_panoptic(
                    eval_step, params, loader, evaluator,
                    combine_kwargs=dict(
                        overlap_threshold=comb.OVERLAP_THRESH,
                        stuff_area_limit=comb.STUFF_AREA_LIMIT,
                        instances_score_thresh=comb.INSTANCES_CONFIDENCE_THRESH,
                    ),
                    place_fn=place_fn,
                )
            elif isinstance(evaluator, SemSegEvaluator):
                # SemanticSegmentor eval: (B,H,W) maps vs labelTrainIds PNGs
                from ..evaluation.sem_seg_eval import inference_on_dataset_semseg

                res = inference_on_dataset_semseg(
                    eval_step, params, loader, evaluator, place_fn=place_fn
                )
            else:
                res = inference_on_dataset(
                    eval_step, params, loader, n, evaluator, place_fn=place_fn
                )
            results[dataset_name] = res
            logger.info("Results on %s:", dataset_name)
            print_csv_format(res)
        return results

    def _build_quant_eval_step(self, cfg, params, eval_bs):
        """TPU.QUANT_EVAL: PTQ the res5 RoI stage (quant/ptq.py) — quantize
        weights from the trained params and calibrate activation scales on
        the first TPU.QUANT_CALIB_BATCHES batches of the FIRST test set
        (representative serving distribution), then return the int8 eval
        step. Only the clip-C4 tower has a layer4 crop stage; other archs
        fall back to the fp step with a warning."""
        from ..quant import calibrate_res5, merge_absmax, quantize_res5, scales_from_absmax
        from .train_loop import make_calib_step, make_eval_step_quant

        backbone = params["params"].get("backbone", {})
        if not any(k.startswith("layer4_") for k in backbone):
            logger.warning("TPU.QUANT_EVAL: no res5 crop stage in this arch; using fp eval")
            return self.eval_step
        calib_step = make_calib_step(self.eval_model)
        loader, _n = build_detection_test_loader(cfg, cfg.DATASETS.TEST[0], batch_size=eval_bs)
        calib = jax.jit(lambda crops: calibrate_res5(backbone, crops))
        absmax = None
        n_batches = 0
        for batch, _metas in loader:
            if n_batches >= max(1, cfg.TPU.QUANT_CALIB_BATCHES):
                break
            crops = calib_step(params, batch)
            absmax = merge_absmax(absmax, jax.device_get(calib(crops)))
            n_batches += 1
        if absmax is None:
            logger.warning("TPU.QUANT_EVAL: empty test loader; using fp eval")
            return self.eval_step
        qblocks = quantize_res5(backbone)
        scales = scales_from_absmax(absmax)
        logger.info(
            "TPU.QUANT_EVAL: int8 res5 (%d blocks) calibrated on %d batch(es)",
            len(qblocks), n_batches,
        )
        return make_eval_step_quant(self.eval_model, qblocks, scales)

    def _verify_final(self, results) -> None:
        """Golden-metric check (reference defaults.py:497-501 /
        train_net.py:163-167) — only on FINAL results: intermediate periodic
        evals are legitimately below the pinned end-of-training values."""
        if self.cfg.TEST.EXPECTED_RESULTS and len(results) == 1:
            from ..evaluation import verify_results

            assert verify_results(self.cfg, next(iter(results.values()))), "Result verification failed!"
