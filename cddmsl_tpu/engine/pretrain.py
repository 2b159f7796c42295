"""RegionCLIP pretraining loop (reference: tools/train_net.py driving
PretrainFastRCNN over the image-text TSV corpus — data/build.py:312-340
`make_clip_dataset` branch + modeling/meta_arch/clip_rcnn.py PretrainFastRCNN).

TPU-first: ONE jitted step over the data mesh; captions are tokenized on
host (BPE) and encoded in-graph by the frozen lang encoder; region proposals
are a static grid (MODEL.CLIP.CROP_REGION_TYPE 'GRID' analogue) so shapes
never change.
"""

import logging
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip_rcnn import PretrainFastRCNN
from .train_loop import TrainState

logger = logging.getLogger(__name__)


def grid_region_boxes(image_size: int, grid: int = 3, scales: Tuple[float, ...] = (1.0, 0.5)) -> np.ndarray:
    """Static grid proposals over a square image: `grid`x`grid` tiles at each
    scale (+ the full image) -> (R, 4) XYXY."""
    boxes = [[0.0, 0.0, image_size, image_size]]
    for s in scales:
        side = image_size * s / grid
        steps = int(round(image_size / side)) if s == 1.0 else grid
        step = (image_size - side) / max(steps - 1, 1)
        for i in range(steps):
            for j in range(steps):
                x1, y1 = j * step, i * step
                boxes.append([x1, y1, x1 + side, y1 + side])
    return np.asarray(boxes, np.float32)


def make_pretrain_step(model: PretrainFastRCNN, optimizer: optax.GradientTransformation):
    """(state, images224, boxes, tokens) -> (state, metrics) — jitted."""

    def loss_fn(params, images, boxes, tokens):
        losses = model.apply(params, images, boxes, tokens, method=model.pretrain_losses_with_text)
        return jnp.sum(jnp.stack(list(losses.values()))), losses

    @jax.jit
    def step(state: TrainState, images, boxes, tokens):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, boxes, tokens
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return step


def pretrain_loop(
    model: PretrainFastRCNN,
    state: TrainState,
    optimizer: optax.GradientTransformation,
    batches: Iterator[Tuple[np.ndarray, list]],
    tokenize,  # captions -> (B, context) int32
    max_iter: int,
    pixel_mean=(0.48145466, 0.4578275, 0.40821073),
    pixel_std=(0.26862954, 0.26130258, 0.27577711),
    image_size: int = 224,
    grid: int = 3,
    log_period: int = 20,
) -> Tuple[TrainState, Dict[str, float]]:
    step_fn = make_pretrain_step(model, optimizer)
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    boxes1 = grid_region_boxes(image_size, grid)
    metrics_host: Dict[str, float] = {}
    t0 = time.time()
    for it, (images_u8, captions) in zip(range(max_iter), batches):
        images = (images_u8.astype(np.float32) / 255.0 - mean) / std
        b = images.shape[0]
        boxes = np.broadcast_to(boxes1, (b,) + boxes1.shape)
        tokens = tokenize(captions)
        state, metrics = step_fn(
            state, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(tokens, jnp.int32)
        )
        if (it + 1) % log_period == 0 or it == max_iter - 1:
            metrics_host = {k: float(v) for k, v in jax.device_get(metrics).items()}
            if not np.isfinite(metrics_host["total_loss"]):
                raise FloatingPointError(f"non-finite pretrain loss at iter {it}: {metrics_host}")
            logger.info("iter %d/%d %.2fs %s", it + 1, max_iter, time.time() - t0, metrics_host)
    return state, metrics_host
