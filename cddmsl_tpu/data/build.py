"""Data loaders: dataset dicts -> static-shape DetBatch stream.

Mirrors the reference build pipeline (detectron2/data/build.py):
  * `get_detection_dataset_dicts` (:212) with empty-annotation filtering
  * infinite sharded `TrainingSampler` / `InferenceSampler`
    (samplers/distributed_sampler.py:12,173)
  * aspect-ratio grouping (common.py:152 AspectRatioGroupedDataset) — here it
    additionally selects one of two static pad buckets (landscape/portrait)
    so each orientation compiles exactly once
  * `build_detection_train_loader` (:382) / `build_detection_test_loader`
    (:623)
  * semi-supervised two-crop loader (:653-781) for the mean-teacher trainer

TPU deltas: batches are collated into fixed-capacity padded `DetBatch`
pytrees (images to the bucket size, GT to TPU.MAX_GT_BOXES) and prefetched on
a background thread; there is no process-per-GPU sharding — one stream feeds
the mesh.
"""

import itertools
import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..models.rcnn import DetBatch
from .catalog import DatasetCatalog
from .dataset_mapper import DatasetMapper, DatasetMapperTwoCropSeparate


def get_detection_dataset_dicts(names: Sequence[str], filter_empty: bool = True) -> List[dict]:
    if isinstance(names, str):
        names = [names]
    dicts: List[dict] = []
    for name in names:
        dicts.extend(DatasetCatalog.get(name))
    if filter_empty:
        dicts = [d for d in dicts if len(d.get("annotations", []))]
    assert dicts, f"No valid images found in {names}"
    return dicts


# ---------------- samplers ----------------
class TrainingSampler:
    """Infinite shuffled index stream (reference distributed_sampler.py:12).
    No per-rank sharding: the single process feeds the whole mesh."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0):
        self.size = size
        self.shuffle = shuffle
        self.seed = seed

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        while True:
            if self.shuffle:
                yield from g.permutation(self.size).tolist()
            else:
                yield from range(self.size)


class InferenceSampler:
    def __init__(self, size: int):
        self.size = size

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.size))


# ---------------- collation ----------------
def pad_and_collate(
    samples: List[dict],
    pad_hw: Tuple[int, int],
    max_gt: int = 100,
    with_trgt: bool = True,
) -> DetBatch:
    b = len(samples)
    H, W = pad_hw
    images = np.zeros((b, H, W, 3), np.float32)
    images_t = np.zeros((b, H, W, 3), np.float32) if with_trgt else None
    sizes = np.zeros((b, 2), np.int32)
    orig = np.zeros((b, 2), np.int32)
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_classes = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    for i, s in enumerate(samples):
        img = s["image"]
        h, w = img.shape[:2]
        assert h <= H and w <= W, f"image ({h},{w}) exceeds pad bucket ({H},{W})"
        images[i, :h, :w] = img
        if with_trgt:
            t = s.get("image_trgt", img)
            images_t[i, :h, :w] = t
        sizes[i] = (h, w)
        orig[i] = s["orig_hw"]
        n = min(len(s["boxes"]), max_gt)
        if n:
            gt_boxes[i, :n] = s["boxes"][:n]
            gt_classes[i, :n] = s["classes"][:n]
            gt_valid[i, :n] = True
    import jax.numpy as jnp

    return DetBatch(
        image=jnp.asarray(images),
        image_sizes=jnp.asarray(sizes),
        orig_sizes=jnp.asarray(orig),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.asarray(gt_classes),
        gt_valid=jnp.asarray(gt_valid),
        image_trgt=jnp.asarray(images_t) if with_trgt else None,
    )


def _bucket_for(sample: dict, pad_hw: Tuple[int, int]) -> Tuple[int, int]:
    """Two static buckets: landscape (H, W) and portrait (W, H)."""
    h, w = sample["image"].shape[:2]
    H, W = min(pad_hw), max(pad_hw)
    return (H, W) if w >= h else (W, H)


class _Prefetcher:
    """Background-thread prefetch (replaces DataLoader worker processes)."""

    def __init__(self, gen_fn: Callable[[], Iterator], depth: int = 4):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = object()
        self.thread = threading.Thread(target=self._run, args=(gen_fn,), daemon=True)
        self.thread.start()

    def _run(self, gen_fn):
        try:
            for item in gen_fn():
                self.q.put(item)
        except Exception as e:  # surface loader errors to the consumer
            self.q.put(e)
        self.q.put(self._stop)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._stop:
                return
            if isinstance(item, Exception):
                raise item
            yield item


# ---------------- loaders ----------------
def build_detection_train_loader(
    cfg, mapper: Optional[DatasetMapper] = None, seed: int = 0
) -> Iterator[DetBatch]:
    """Infinite stream of training DetBatches with aspect-ratio bucketing
    (reference build.py:382 + common.py:152)."""
    dicts = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN, cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
    )
    mapper = mapper or DatasetMapper(cfg, is_train=True)
    sampler = TrainingSampler(len(dicts), seed=seed)
    batch_size = cfg.SOLVER.IMS_PER_BATCH
    pad_hw = tuple(cfg.TPU.PAD_SIZE_TRAIN)
    max_gt = cfg.TPU.MAX_GT_BOXES
    aspect_grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING

    def gen():
        rng = np.random.RandomState(seed + 1)
        buckets = {}
        for idx in sampler:
            sample = mapper(dicts[idx], rng)
            key = _bucket_for(sample, pad_hw) if aspect_grouping else (max(pad_hw), max(pad_hw))
            buckets.setdefault(key, []).append(sample)
            if len(buckets[key]) == batch_size:
                group, buckets[key] = buckets[key], []
                yield pad_and_collate(group, key, max_gt, with_trgt=True)

    return iter(_Prefetcher(gen, depth=cfg.DATALOADER.NUM_WORKERS))


def build_detection_test_loader(
    cfg, dataset_name: str, batch_size: Optional[int] = None
) -> Tuple[Iterator[Tuple[DetBatch, List[dict]]], int]:
    """Finite stream of (DetBatch, metadata-dicts) for evaluation; the final
    batch is padded by repeating the last image (extra rows are dropped via
    the returned per-batch metadata length). Returns (iterator, num_images).

    Unlike the reference (batch=1 per GPU, build.py:623), TPU wants fixed
    batched shapes: default batch = MODEL.CLIP.IMS_PER_BATCH_TEST."""
    dicts = get_detection_dataset_dicts([dataset_name], filter_empty=False)
    mapper = DatasetMapper(cfg, is_train=False)
    batch_size = batch_size or cfg.MODEL.CLIP.IMS_PER_BATCH_TEST
    pad_hw = tuple(cfg.TPU.PAD_SIZE_TEST)
    max_gt = cfg.TPU.MAX_GT_BOXES

    def gen():
        rng = np.random.RandomState(0)
        # group by orientation to keep two static shapes
        groups = {}
        metas = {}
        for d in dicts:
            sample = mapper(d, rng)
            key = _bucket_for(sample, pad_hw)
            groups.setdefault(key, []).append(sample)
            metas.setdefault(key, []).append(d)
            if len(groups[key]) == batch_size:
                yield pad_and_collate(groups[key], key, max_gt, with_trgt=False), metas[key]
                groups[key], metas[key] = [], []
        for key, group in groups.items():
            if group:
                meta = metas[key]
                n = len(group)
                group = group + [group[-1]] * (batch_size - n)
                yield pad_and_collate(group, key, max_gt, with_trgt=False), meta

    return iter(_Prefetcher(gen, depth=4)), len(dicts)


def divide_label_unlabel(
    dicts: List[dict], sup_percent: float, seed: int, seed_path: Optional[str] = None
) -> Tuple[List[dict], List[dict]]:
    """Split into labeled/unlabeled subsets (reference build.py:540-563).
    If seed_path points at the reference's JSON seed file, use its indices;
    otherwise derive a deterministic random split."""
    n = len(dicts)
    num_label = int(sup_percent / 100.0 * n)
    if seed_path:
        import json, os

        if os.path.exists(seed_path):
            with open(seed_path) as f:
                seeds = json.load(f)
            idx = seeds[str(sup_percent)][str(seed)][:num_label]
        else:
            idx = np.random.RandomState(seed).permutation(n)[:num_label].tolist()
    else:
        idx = np.random.RandomState(seed).permutation(n)[:num_label].tolist()
    labeled = set(int(i) for i in idx)
    return [d for i, d in enumerate(dicts) if i in labeled], [
        d for i, d in enumerate(dicts) if i not in labeled
    ]


def build_semisup_train_loader_two_crops(cfg, seed: int = 0):
    """Two-stream (label, unlabel) x (strong, weak) loader for the
    mean-teacher trainer (reference build.py:653-781 +
    AspectRatioGroupedSemiSupDatasetTwoCrop common.py:235). Yields
    ((label_strong, label_weak), (unlabel_strong, unlabel_weak)) DetBatches."""
    if cfg.DATASETS.CROSS_DATASET:
        label_dicts = get_detection_dataset_dicts(cfg.DATASETS.TRAIN_LABEL, True)
        unlabel_dicts = get_detection_dataset_dicts(cfg.DATASETS.TRAIN_UNLABEL, False)
    else:
        dicts = get_detection_dataset_dicts(cfg.DATASETS.TRAIN, True)
        label_dicts, unlabel_dicts = divide_label_unlabel(
            dicts,
            cfg.DATALOADER.SUP_PERCENT,
            cfg.DATALOADER.RANDOM_DATA_SEED,
            cfg.DATALOADER.RANDOM_DATA_SEED_PATH,
        )
    mapper = DatasetMapperTwoCropSeparate(cfg, True)
    pad_hw = tuple(cfg.TPU.PAD_SIZE_TRAIN)
    max_gt = cfg.TPU.MAX_GT_BOXES
    bs_label = cfg.SOLVER.IMG_PER_BATCH_LABEL
    bs_unlabel = cfg.SOLVER.IMG_PER_BATCH_UNLABEL

    def gen():
        rng = np.random.RandomState(seed + 1)
        lab_it = iter(TrainingSampler(len(label_dicts), seed=seed))
        unl_it = iter(TrainingSampler(len(unlabel_dicts), seed=seed + 7))
        # fixed landscape bucket for simplicity of the 4-stream alignment
        key = (min(pad_hw), max(pad_hw))

        def take(dicts_, it, n):
            strong, weak = [], []
            while len(strong) < n:
                s, w = mapper(dicts_[next(it)], rng)
                sh, sw = s["image"].shape[:2]
                if sw < sh:  # rotate portrait into the landscape bucket domain
                    continue
                strong.append(s)
                weak.append(w)
            return strong, weak

        while True:
            ls, lw = take(label_dicts, lab_it, bs_label)
            us, uw = take(unlabel_dicts, unl_it, bs_unlabel)
            yield (
                (pad_and_collate(ls, key, max_gt), pad_and_collate(lw, key, max_gt)),
                (pad_and_collate(us, key, max_gt), pad_and_collate(uw, key, max_gt)),
            )

    return iter(_Prefetcher(gen, depth=cfg.DATALOADER.NUM_WORKERS))
