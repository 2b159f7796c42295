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
a background thread. Process sharding is per HOST, not per GPU: under
multi-host execution (parallel/multihost.py) every process walks the SAME
global sampler + bucket stream — all hosts must agree on each step's static
pad bucket, because they jointly execute ONE SPMD program — but collates
only its own contiguous row-block of each global batch (`_process_block`).
The global batch assembled on device is therefore bit-identical to the
single-host one (the reference's per-rank strided sharding,
samplers/distributed_sampler.py:12, reorders rows instead). The map cost of
non-owned rows is paid on every host; acceptable for detection batch sizes
(<=32 images/step) and kept for bucket-lockstep safety.
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
    if filter_empty and dicts and "annotations" in dicts[0]:
        # reference build.py:212 filters only instance-annotated datasets;
        # panoptic dicts carry GT in segments_info/pan_seg_file_name instead
        dicts = [d for d in dicts if len(d.get("annotations", []))]
    assert dicts, f"No valid images found in {names}"
    return dicts


def filter_images_with_few_keypoints(dicts: List[dict], min_kp: int) -> List[dict]:
    """Drop train images with < min_kp visible keypoints (reference
    build.py:72 filter_images_with_few_keypoints; applied when
    MODEL.KEYPOINT_ON and ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE > 0)."""

    def visible(d):
        return sum(
            int((np.asarray(a["keypoints"][2::3]) > 0).sum())
            for a in d.get("annotations", [])
            if "keypoints" in a
        )

    out = [d for d in dicts if visible(d) >= min_kp]
    assert out, "all images were filtered by MIN_KEYPOINTS_PER_IMAGE"
    return out


# ---------------- samplers ----------------
def _process_block(samples: List):
    """This process's contiguous row-block of a global batch (multi-host).
    Identity in the (usual) single-process case."""
    from ..parallel import multihost

    if multihost.get_world_size() == 1:
        return samples
    lo, hi = multihost.local_rows(len(samples))
    return samples[lo:hi]


class TrainingSampler:
    """Infinite shuffled index stream (reference distributed_sampler.py:12).
    Deliberately NOT rank-sharded: under multi-host every process walks the
    same global stream so aspect-ratio buckets stay in lockstep (one static
    shape per SPMD step); the per-process split happens at collation
    (`_process_block`)."""

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


class RepeatFactorTrainingSampler:
    """Class-frequency rebalancing sampler (reference
    data/samplers/distributed_sampler.py:57 RepeatFactorTrainingSampler, the
    LVIS recipe): image repeat factor = max over its categories of
    max(1, sqrt(t / f(c))) where f(c) is the fraction of images containing
    category c; the fractional part is realized by stochastic rounding each
    epoch."""

    def __init__(self, dataset_dicts: List[dict], repeat_thresh: float, seed: int = 0):
        self.seed = seed
        # f(c): fraction of images containing each category
        from collections import Counter, defaultdict

        counts: Counter = Counter()
        n = len(dataset_dicts)
        per_image_cats = []
        for d in dataset_dicts:
            cats = {a["category_id"] for a in d.get("annotations", [])}
            per_image_cats.append(cats)
            counts.update(cats)
        rep_cat = {
            c: max(1.0, np.sqrt(repeat_thresh / (cnt / n))) for c, cnt in counts.items()
        }
        self._rep = np.asarray(
            [max([rep_cat[c] for c in cats], default=1.0) for cats in per_image_cats],
            np.float64,
        )

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self.seed)
        n = len(self._rep)
        while True:
            # stochastic rounding of the fractional repeat factors
            rands = g.rand(n)
            rep = np.floor(self._rep) + (rands < (self._rep - np.floor(self._rep)))
            indices = np.repeat(np.arange(n), rep.astype(np.int64))
            yield from g.permutation(indices).tolist()


class InferenceSampler:
    def __init__(self, size: int):
        self.size = size

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.size))


# ---------------- collation ----------------
def rasterize_polygons(
    polygons: List[List[np.ndarray]], hw: Tuple[int, int], stride: int
) -> np.ndarray:
    """Per-instance polygon rings (image coords) -> (N, H/stride, W/stride)
    {0,1} bitmasks. Delegates the fill to evaluation/masks.py
    polygons_to_bitmask so training targets and eval GT masks share ONE
    rasterization semantics."""
    from ..evaluation.masks import polygons_to_bitmask

    h, w = max(1, hw[0] // stride), max(1, hw[1] // stride)
    out = np.zeros((len(polygons), h, w), np.float32)
    for i, rings in enumerate(polygons):
        scaled = [np.asarray(ring, np.float64) / stride for ring in rings if len(ring) >= 3]
        out[i] = polygons_to_bitmask(scaled, (h, w)).astype(np.float32)
    return out


def pad_and_collate(
    samples: List[dict],
    pad_hw: Tuple[int, int],
    max_gt: int = 100,
    with_trgt: bool = True,
    mask_stride: int = 0,
    num_keypoints: int = 0,
    max_proposals: int = 0,
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
    gt_masks = (
        np.zeros((b, max_gt, max(1, H // mask_stride), max(1, W // mask_stride)), np.float32)
        if mask_stride
        else None
    )
    gt_keypoints = (
        np.zeros((b, max_gt, num_keypoints, 3), np.float32) if num_keypoints else None
    )
    prop_boxes = np.zeros((b, max_proposals, 4), np.float32) if max_proposals else None
    prop_scores = np.full((b, max_proposals), -np.inf, np.float32) if max_proposals else None
    prop_valid = np.zeros((b, max_proposals), bool) if max_proposals else None
    # semantic target rides along when the mapper emits it (panoptic/semseg
    # training); canvas padding is the ignore label
    sem_seg = (
        np.full((b, H, W), 255, np.int32) if any("sem_seg" in s for s in samples) else None
    )
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
            if gt_masks is not None and s.get("polygons"):
                # rasterize in the PADDED canvas so box coords line up
                gt_masks[i, :n] = rasterize_polygons(s["polygons"][:n], (H, W), mask_stride)
            elif gt_masks is not None and s.get("bitmasks") is not None:
                # panoptic path: per-thing bitmasks cut from the id map
                # (image coords) -> strided canvas, same layout as polygons
                ch, cw = gt_masks.shape[2], gt_masks.shape[3]
                for j, bm in enumerate(s["bitmasks"][:n]):
                    canvas = np.zeros((H, W), np.float32)
                    canvas[: bm.shape[0], : bm.shape[1]] = bm
                    gt_masks[i, j] = canvas[::mask_stride, ::mask_stride][:ch, :cw]
            if gt_keypoints is not None and s.get("keypoints") is not None and len(s["keypoints"]):
                kp = np.asarray(s["keypoints"], np.float32)[:n]
                gt_keypoints[i, :n, : kp.shape[1]] = kp[:, :num_keypoints]
        if prop_boxes is not None and s.get("proposal_boxes") is not None:
            p = min(len(s["proposal_boxes"]), max_proposals)
            if p:
                prop_boxes[i, :p] = s["proposal_boxes"][:p]
                prop_scores[i, :p] = s["proposal_objectness"][:p]
                prop_valid[i, :p] = True
        if sem_seg is not None and s.get("sem_seg") is not None:
            sem_seg[i, :h, :w] = s["sem_seg"]
    import jax.numpy as jnp

    return DetBatch(
        image=jnp.asarray(images),
        image_sizes=jnp.asarray(sizes),
        orig_sizes=jnp.asarray(orig),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.asarray(gt_classes),
        gt_valid=jnp.asarray(gt_valid),
        image_trgt=jnp.asarray(images_t) if with_trgt else None,
        gt_masks=jnp.asarray(gt_masks) if gt_masks is not None else None,
        gt_keypoints=jnp.asarray(gt_keypoints) if gt_keypoints is not None else None,
        proposal_boxes=jnp.asarray(prop_boxes) if prop_boxes is not None else None,
        proposal_scores=jnp.asarray(prop_scores) if prop_scores is not None else None,
        proposal_valid=jnp.asarray(prop_valid) if prop_valid is not None else None,
        sem_seg=jnp.asarray(sem_seg) if sem_seg is not None else None,
    )


def _bucket_for(
    sample: dict, pad_hw: Tuple[int, int], buckets: Optional[Sequence[Tuple[int, int]]] = None
) -> Tuple[int, int]:
    """Static pad-bucket choice. Without a ladder: two buckets — landscape
    (H, W) and portrait (W, H). With `buckets` (cfg.TPU.PAD_BUCKETS): the
    smallest ladder entry that fits, in the image's orientation; each bucket
    compiles its own step (one-time cost), every smaller image pays less
    backbone FLOPs (docs/PERF.md lever #2)."""
    h, w = sample["image"].shape[:2]
    if buckets:
        cands = []
        for bh, bw in buckets:
            lo, hi = min(bh, bw), max(bh, bw)
            key = (lo, hi) if w >= h else (hi, lo)
            if h <= key[0] and w <= key[1]:
                cands.append((key[0] * key[1], key))
        if cands:
            return min(cands)[1]
    H, W = min(pad_hw), max(pad_hw)
    return (H, W) if w >= h else (W, H)


import weakref

_LIVE_PREFETCHERS: "weakref.WeakSet" = weakref.WeakSet()


def stop_all_prefetchers() -> int:
    """Stop every live prefetch thread. Train loaders are INFINITE
    generators, so an abandoned loader leaves a producer thread alive; on a
    small host those threads convoy with the consumer's jit dispatch (each
    item does device_puts that contend on jax's dispatch locks — observed as
    a multi-hour suite stall once several test modules had abandoned
    loaders). Tests call this between modules (tests/conftest.py); the
    trainer's loader lives for the whole run, so production code never
    needs it."""
    n = 0
    for p in list(_LIVE_PREFETCHERS):
        p.close()
        n += 1
    return n


class _Prefetcher:
    """Background-thread prefetch (replaces DataLoader worker processes)."""

    def __init__(self, gen_fn: Callable[[], Iterator], depth: int = 4):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = object()
        self._closed = threading.Event()
        self.thread = threading.Thread(target=self._run, args=(gen_fn,), daemon=True)
        self.thread.start()
        _LIVE_PREFETCHERS.add(self)

    def close(self):
        """Ask the producer thread to exit after its current item; drain the
        queue so a blocked put() wakes up."""
        self._closed.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        try:  # unblock any consumer still iterating
            self.q.put_nowait(self._stop)
        except queue.Full:
            pass

    def _run(self, gen_fn):
        try:
            for item in gen_fn():
                if self._closed.is_set():
                    return
                self.q.put(item)
                if self._closed.is_set():
                    return
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
    min_kp = cfg.MODEL.ROI_KEYPOINT_HEAD.MIN_KEYPOINTS_PER_IMAGE
    if cfg.MODEL.KEYPOINT_ON and min_kp > 0:
        dicts = filter_images_with_few_keypoints(dicts, min_kp)
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TRAIN:
        from .proposals import load_proposals_into_dataset

        for pf in cfg.DATASETS.PROPOSAL_FILES_TRAIN:
            dicts = load_proposals_into_dataset(dicts, pf)
    if mapper is None and dicts and "pan_seg_file_name" in dicts[0]:
        # panoptic datasets carry their GT in the panoptic PNG; the panoptic
        # mapper derives thing boxes + the sem_seg target from it (reference
        # DatasetMapper's pan_seg branch)
        from .dataset_mapper import PanopticDatasetMapper

        mapper = PanopticDatasetMapper(cfg, is_train=True)
    elif mapper is None and dicts and "sem_seg_file_name" in dicts[0] and "annotations" not in dicts[0]:
        # pure sem-seg datasets (reference DatasetMapper sem_seg branch)
        from .dataset_mapper import SemSegDatasetMapper

        mapper = SemSegDatasetMapper(cfg, is_train=True)
    mapper = mapper or DatasetMapper(cfg, is_train=True)
    if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
        sampler = RepeatFactorTrainingSampler(dicts, cfg.DATALOADER.REPEAT_THRESHOLD, seed=seed)
    else:
        sampler = TrainingSampler(len(dicts), seed=seed)
    batch_size = cfg.SOLVER.IMS_PER_BATCH
    pad_hw = tuple(cfg.TPU.PAD_SIZE_TRAIN)
    max_gt = cfg.TPU.MAX_GT_BOXES
    mask_stride = cfg.TPU.MASK_CANVAS_STRIDE if cfg.MODEL.MASK_ON else 0
    num_kp = cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS if cfg.MODEL.KEYPOINT_ON else 0
    max_props = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN if cfg.MODEL.LOAD_PROPOSALS else 0
    bucket_ladder = [tuple(b) for b in cfg.TPU.PAD_BUCKETS]
    aspect_grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING

    def gen():
        rng = np.random.RandomState(seed + 1)
        buckets = {}
        for idx in sampler:
            sample = mapper(dicts[idx], rng)
            key = _bucket_for(sample, pad_hw, bucket_ladder) if aspect_grouping else (max(pad_hw), max(pad_hw))
            buckets.setdefault(key, []).append(sample)
            if len(buckets[key]) == batch_size:
                group, buckets[key] = buckets[key], []
                yield pad_and_collate(_process_block(group), key, max_gt, with_trgt=True,
                                      mask_stride=mask_stride,
                                      num_keypoints=num_kp, max_proposals=max_props)

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
    if cfg.MODEL.LOAD_PROPOSALS and cfg.DATASETS.PROPOSAL_FILES_TEST:
        from .proposals import load_proposals_into_dataset

        names = list(cfg.DATASETS.TEST)
        pf_idx = names.index(dataset_name) if dataset_name in names else 0
        files = list(cfg.DATASETS.PROPOSAL_FILES_TEST)
        if pf_idx < len(files):
            dicts = load_proposals_into_dataset(dicts, files[pf_idx])
    mapper = DatasetMapper(cfg, is_train=False)
    batch_size = batch_size or cfg.MODEL.CLIP.IMS_PER_BATCH_TEST
    pad_hw = tuple(cfg.TPU.PAD_SIZE_TEST)
    max_gt = cfg.TPU.MAX_GT_BOXES
    max_props = cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST if cfg.MODEL.LOAD_PROPOSALS else 0

    def gen():
        rng = np.random.RandomState(0)
        # group by orientation to keep two static shapes
        groups = {}
        metas = {}
        for i in InferenceSampler(len(dicts)):
            d = dicts[i]
            sample = mapper(d, rng)
            key = _bucket_for(sample, pad_hw)
            groups.setdefault(key, []).append(sample)
            metas.setdefault(key, []).append(d)
            if len(groups[key]) == batch_size:
                # multi-host: batch rows are this process's block, metas stay
                # FULL — eval outputs come back replicated across processes
                # (evaluator.py fetch), so every host scores all rows
                yield pad_and_collate(_process_block(groups[key]), key, max_gt, with_trgt=False, max_proposals=max_props), metas[key]
                groups[key], metas[key] = [], []
        for key, group in groups.items():
            if group:
                meta = metas[key]
                n = len(group)
                group = group + [group[-1]] * (batch_size - n)
                yield pad_and_collate(_process_block(group), key, max_gt, with_trgt=False, max_proposals=max_props), meta

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

        def take(dicts_, it, n, buckets):
            """Accumulate (strong, weak) pairs per orientation bucket; return
            the first bucket that fills. Portrait images get the transposed
            pad shape instead of being dropped (reference common.py:235 keeps
            both orientations; round-1 dropped portrait — a data bias)."""
            while True:
                s, w = mapper(dicts_[next(it)], rng)
                key = _bucket_for(s, pad_hw)
                pairs = buckets.setdefault(key, [])
                pairs.append((s, w))
                if len(pairs) == n:
                    del buckets[key]
                    return key, [p[0] for p in pairs], [p[1] for p in pairs]

        lab_buckets, unl_buckets = {}, {}
        while True:
            key_l, ls, lw = take(label_dicts, lab_it, bs_label, lab_buckets)
            key_u, us, uw = take(unlabel_dicts, unl_it, bs_unlabel, unl_buckets)
            ls, lw, us, uw = map(_process_block, (ls, lw, us, uw))
            yield (
                (pad_and_collate(ls, key_l, max_gt), pad_and_collate(lw, key_l, max_gt)),
                (pad_and_collate(us, key_u, max_gt), pad_and_collate(uw, key_u, max_gt)),
            )

    return iter(_Prefetcher(gen, depth=cfg.DATALOADER.NUM_WORKERS))


def build_lazy_train_loader(
    dataset: str,
    batch_size: int = 2,
    min_size: Sequence[int] = (96,),
    max_size: int = 160,
    pad_hw: Sequence[int] = (96, 144),
    max_gt: int = 100,
    mask_on: bool = False,
    keypoint_on: bool = False,
    num_keypoints: int = 17,
    num_workers: int = 0,
    seed: int = 0,
    augmentations=None,
):
    """Explicit-args train loader for LazyConfig recipes (the equivalent of
    the reference configs/common/data/*.py dataloader.train entries, which
    call build_detection_train_loader with explicit mapper args). Builds a
    minimal cfg internally and delegates to build_detection_train_loader.

    `augmentations`: explicit Augmentation objects for the mapper (the
    new_baselines LSJ recipes pass [ResizeScale, FixedSizeCrop, RandomFlip]
    here, reference configs/common/data/coco.py + new_baselines/*.py)."""
    from ..config import get_cfg

    cfg = get_cfg()
    cfg.DATASETS.TRAIN = [dataset]
    cfg.SOLVER.IMS_PER_BATCH = batch_size
    cfg.INPUT.MIN_SIZE_TRAIN = list(min_size)
    cfg.INPUT.MAX_SIZE_TRAIN = max_size
    cfg.TPU.PAD_SIZE_TRAIN = list(pad_hw)
    cfg.TPU.MAX_GT_BOXES = max_gt
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.KEYPOINT_ON = keypoint_on
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = num_keypoints
    cfg.DATALOADER.NUM_WORKERS = num_workers
    mapper = None
    if augmentations is not None:
        mapper = DatasetMapper(cfg, is_train=True, augmentations=augmentations)
    return build_detection_train_loader(cfg, mapper=mapper, seed=seed)


def build_lazy_test_loader(
    dataset: str,
    batch_size: int = 2,
    min_size: int = 96,
    max_size: int = 160,
    pad_hw: Sequence[int] = (96, 144),
    max_gt: int = 100,
):
    """Explicit-args test loader for LazyConfig recipes."""
    from ..config import get_cfg

    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = min_size
    cfg.INPUT.MAX_SIZE_TEST = max_size
    cfg.TPU.PAD_SIZE_TEST = list(pad_hw)
    cfg.TPU.MAX_GT_BOXES = max_gt
    return build_detection_test_loader(cfg, dataset)
