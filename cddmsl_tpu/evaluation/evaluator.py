"""Dataset inference loop with data/compute/eval time accounting
(reference detectron2/evaluation/evaluator.py:103-210 inference_on_dataset)."""

import datetime
import logging
import time
from typing import Callable, Optional, Sequence

import numpy as np

from ..data.catalog import MetadataCatalog

logger = logging.getLogger(__name__)


def inference_on_dataset(
    eval_step: Callable,  # (params, DetBatch) -> DetectionResult (jitted)
    params,
    data_loader,
    num_images: int,
    evaluator,
    warmup: int = 1,
    place_fn: Optional[Callable] = None,
) -> dict:
    """Runs the model over the loader, feeds the evaluator, returns metrics.

    The loader yields (DetBatch, metas) where len(metas) <= batch gives the
    number of real (non-repeated-padding) images in the batch.

    `place_fn` (optional) places each host batch on devices before the step —
    the mesh-sharded-eval hook (engine/defaults.py test() passes shard_batch
    over the trainer mesh, the TPU-native form of the reference's
    DDP-distributed inference_on_dataset, evaluator.py:103-210 +
    InferenceSampler shard-per-rank)."""
    evaluator.reset() if hasattr(evaluator, "reset") else None
    total_compute, total_eval, total_data = 0.0, 0.0, 0.0
    start = time.time()
    seen = 0
    t_data = time.time()
    warmed = set()  # batch shapes pre-compiled+aligned (multi-process CPU)
    for batch, metas in data_loader:
        total_data += time.time() - t_data
        t0 = time.time()
        if place_fn is not None:
            batch = place_fn(batch)
        import jax as _jax

        if _jax.process_count() > 1:
            from ..parallel import multihost

            key = tuple(
                tuple(x.shape) for x in _jax.tree_util.tree_leaves(batch)
            )
            if key not in warmed:
                warmed.add(key)
                # compile-then-barrier-then-dispatch per bucket shape
                # (parallel/multihost.py warm_and_align docstring)
                multihost.warm_and_align(eval_step, params, batch)
        det = eval_step(params, batch)
        # multihost.fetch == np.asarray single-process; under multi-host it
        # replicates the cross-process-sharded output so EVERY host scores
        # the full batch against the full metas (loaders keep metas global)
        from ..parallel.multihost import fetch

        boxes = fetch(det.boxes)
        scores = fetch(det.scores)
        classes = fetch(det.classes)
        valid = fetch(det.valid)
        masks = fetch(det.masks)
        det_kps = fetch(getattr(det, "keypoints", None))
        total_compute += time.time() - t0

        t1 = time.time()
        segm = masks is not None and "segm" in getattr(evaluator, "tasks", ())
        kp_task = det_kps is not None and "keypoints" in getattr(evaluator, "tasks", ())
        for i, meta in enumerate(metas):
            keep = valid[i]
            hw = (meta.get("height"), meta.get("width")) if segm else None
            kwargs = {"masks": masks[i][keep], "image_hw": hw} if segm else {}
            if kp_task:
                kwargs["keypoints"] = det_kps[i][keep]
            evaluator.process(
                meta["image_id"], boxes[i][keep], scores[i][keep], classes[i][keep], **kwargs
            )
            if "annotations" in meta:
                gb = np.array([a["bbox"] for a in meta["annotations"]], np.float32).reshape(-1, 4)
                gc = np.array([a["category_id"] for a in meta["annotations"]], np.int32).reshape(-1)
                gd = np.array([a.get("difficult", 0) for a in meta["annotations"]], bool).reshape(-1)
                gt_kwargs = {}
                if segm:
                    gt_kwargs = {
                        "segmentations": [a.get("segmentation") for a in meta["annotations"]],
                        "image_hw": hw,
                    }
                if kp_task:
                    gt_kwargs["keypoints"] = [
                        np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
                        if a.get("keypoints") is not None
                        else None
                        for a in meta["annotations"]
                    ]
                if "neg_category_ids" in meta and getattr(evaluator, "accepts_lvis_ignore", False):
                    # LVIS per-image exhaustiveness (only evaluators that
                    # declare support — COCOEvaluator.process_gt would TypeError)
                    gt_kwargs["neg_category_ids"] = meta["neg_category_ids"]
                    gt_kwargs["not_exhaustive_category_ids"] = meta.get(
                        "not_exhaustive_category_ids", ()
                    )
                evaluator.process_gt(meta["image_id"], gb, gc, gd, **gt_kwargs)
        seen += len(metas)
        total_eval += time.time() - t1
        t_data = time.time()

    total = time.time() - start
    logger.info(
        "Inference done on %d images: total %.1fs (%.4fs/img compute, %.4fs/img data, %.4fs/img eval)",
        seen,
        total,
        total_compute / max(seen, 1),
        total_data / max(seen, 1),
        total_eval / max(seen, 1),
    )
    results = evaluator.evaluate()
    return results if results is not None else {}


def print_csv_format(results: dict) -> str:
    """reference evaluation/testing.py print_csv_format."""
    lines = []
    for task, metrics in results.items():
        lines.append(f"[{task}]")
        lines.append(",".join(metrics.keys()))
        lines.append(",".join(f"{v:.4f}" for v in metrics.values()))
    out = "\n".join(lines)
    logger.info("Evaluation results:\n%s", out)
    return out


def verify_results(cfg, results: dict) -> bool:
    """Check TEST.EXPECTED_RESULTS = [[task, metric, mean, tolerance], ...]
    (reference evaluation/testing.py verify_results)."""
    expected = cfg.TEST.EXPECTED_RESULTS
    if not expected:
        return True
    ok = True
    for task, metric, mean, tol in expected:
        actual = results[task][metric]
        if abs(actual - mean) > tol:
            logger.error("%s/%s = %.4f, expected %.4f +/- %.4f", task, metric, actual, mean, tol)
            ok = False
    return ok
