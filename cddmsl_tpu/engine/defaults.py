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
from .train_loop import TrainState, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def default_argument_parser():
    """reference engine/defaults.py:82 (minus the multi-process flags)."""
    parser = argparse.ArgumentParser(description="cddmsl_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--num-gpus", type=int, default=0, help="accepted for CLI compat; ignored (the mesh uses all devices)")
    parser.add_argument("--num-machines", type=int, default=1, help="ignored")
    parser.add_argument("--machine-rank", type=int, default=0, help="ignored")
    parser.add_argument("--dist-url", default="", help="ignored")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def default_setup(cfg: CfgNode, args=None):
    output_dir = cfg.OUTPUT_DIR
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO, format="[%(asctime)s %(name)s]: %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    if cfg.SEED >= 0:
        np.random.seed(cfg.SEED)
    try:
        cfg.dump_to_file(os.path.join(output_dir, "config.yaml"))
    except Exception:
        pass
    logger.info("devices: %s", jax.devices())


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

        return COCOEvaluator(dataset_name)
    raise NotImplementedError(f"evaluator type {ev_type}")


def launch(main_func, num_gpus_per_machine=0, num_machines=1, machine_rank=0, dist_url=None, args=()):
    """CLI-compat shim for the reference engine.launch (launch.py:27): there
    is no process-per-device spawning — one process drives the mesh — so this
    simply invokes main."""
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
        return {
            "boxes": np.asarray(det.boxes[0])[keep],
            "scores": np.asarray(det.scores[0])[keep],
            "classes": np.asarray(det.classes[0])[keep],
        }


class DefaultTrainer:
    def __init__(self, cfg: CfgNode):
        register_all()
        self.cfg = cfg
        self.mesh = mesh_from_cfg(cfg)
        self.model = build_model(cfg)

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        init_b = _init_batch(cfg)
        params = self.model.init({"params": rng}, init_b, rng, method=self.model.init_all)
        self.optimizer = build_optimizer(cfg, params)
        self.state = TrainState.create(params, self.optimizer)

        self.lr_schedule = build_lr_schedule(cfg)
        self.train_step = make_train_step(
            self.model,
            self.optimizer,
            enable_caption=cfg.TPU.ENABLE_CAPTION_CONSISTENCY,
            kd_regularization=cfg.MODEL.KD_REGULRAZIATION,
            caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
            lr_schedule=self.lr_schedule,
        )
        self.eval_step = make_eval_step(self.model)
        self.checkpointer = DetectionCheckpointer(cfg.OUTPUT_DIR)
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self._data_loader = None

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
        self.start_iter = int(jax.device_get(self.state.step))

    # ---- training ----
    def train(self):
        cfg = self.cfg
        if self._data_loader is None:
            self._data_loader = build_detection_train_loader(cfg, seed=max(cfg.SEED, 0))
        loader = self._data_loader
        state = replicate(self.state, self.mesh)
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 12345)

        writers = [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json")),
            TensorboardXWriter(cfg.OUTPUT_DIR),
        ]
        log_period = 20
        metrics = None
        logger.info("Starting training from iteration %d", self.start_iter)
        with EventStorage(self.start_iter) as storage:
            t_step = time.time()
            with jax.sharding.set_mesh(self.mesh):
                for it in range(self.start_iter, self.max_iter):
                    batch = shard_batch(next(loader), self.mesh)
                    step_rng = jax.random.fold_in(rng, it)
                    state, metrics = self.train_step(state, batch, step_rng)

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
                        for w in writers:
                            w.write(storage)

                    if cfg.SOLVER.CHECKPOINT_PERIOD and (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                        self.state = jax.device_get(state)
                        self.checkpointer.save(f"model_{it:07d}", self.state)

                    if cfg.TEST.EVAL_PERIOD and (it + 1) % cfg.TEST.EVAL_PERIOD == 0:
                        self.state = state
                        results = self.test(cfg, self.state)
                        for ds, res in results.items():
                            for task, m in res.items():
                                for k, v in m.items():
                                    if not k.startswith("AP50-"):
                                        storage.put_scalar(f"{ds}/{task}/{k}", v, smoothing_hint=False)
                    storage.step()
        self.state = jax.device_get(state)
        self.checkpointer.save("model_final", self.state)
        for w in writers:
            w.close()
        return self.test(cfg, self.state) if cfg.DATASETS.TEST else {}

    # ---- evaluation ----
    def test(self, cfg=None, state=None) -> Dict[str, dict]:
        cfg = cfg or self.cfg
        state = state if state is not None else self.state
        params = state.params if hasattr(state, "params") else state
        results = {}
        for dataset_name in cfg.DATASETS.TEST:
            loader, n = build_detection_test_loader(cfg, dataset_name)
            evaluator = build_evaluator(cfg, dataset_name)
            res = inference_on_dataset(self.eval_step, params, loader, n, evaluator)
            results[dataset_name] = res
            logger.info("Results on %s:", dataset_name)
            print_csv_format(res)
        return results
