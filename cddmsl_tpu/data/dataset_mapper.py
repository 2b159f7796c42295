"""Dataset mappers: dataset dict -> per-image numpy sample.

Mirrors the reference mappers (detectron2/data/dataset_mapper.py):
  * `DatasetMapper` (:22-217): reads `file_name` AND the translated twin
    `data_dt_file_name`, applies the SAME sampled geometric transforms to
    both views (:159-161), transforms the boxes, and emits "image" +
    "image_trgt" + targets
  * `DatasetMapperTwoCropSeparate` (:403-569): returns (strong, weak) crops
    of the same image for the mean-teacher loop, sharing the geometric
    transform, with the SimCLR strong augmentation on the strong view
"""

from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from .transforms import (
    apply_augmentations,
    build_augmentation,
    build_strong_augmentation_fn,
)


def read_image(path: str, fmt: str = "RGB") -> np.ndarray:
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img)
    if fmt == "BGR":
        arr = arr[:, :, ::-1]
    return arr


def _transform_annotations(
    annos: List[dict], tfms, image_hw, with_masks: bool = False,
    with_keypoints: bool = False, hflip_indices=None,
) -> Dict[str, np.ndarray]:
    boxes = np.array([a["bbox"] for a in annos], np.float32).reshape(-1, 4)
    classes = np.array([a["category_id"] for a in annos], np.int32).reshape(-1)
    polygons = None
    if with_masks:
        # per-instance list of (P_i, 2) transformed polygon rings
        polygons = []
        for a in annos:
            segs = a.get("segmentation") or []
            rings = []
            for seg in segs if isinstance(segs, list) else []:
                pts = np.asarray(seg, np.float32).reshape(-1, 2)
                if len(pts) >= 3:
                    rings.append(tfms.apply_coords(pts))
            polygons.append(rings)
    keypoints = None
    if with_keypoints:
        # (N, K, 3) image-coord keypoints through the shared TransformList
        # (reference detection_utils.py transform_instance_annotations
        # keypoints branch)
        from .transforms import transform_keypoint_annotations

        kps = [np.asarray(a.get("keypoints", []), np.float32).reshape(-1, 3) for a in annos]
        k = max((len(x) for x in kps), default=0)
        keypoints = np.zeros((len(annos), k, 3), np.float32)
        for i, kp in enumerate(kps):
            if len(kp):
                keypoints[i, : len(kp)] = transform_keypoint_annotations(
                    kp, tfms, image_hw, hflip_indices
                )
    if len(boxes):
        boxes = tfms.apply_box(boxes)
        h, w = image_hw
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        boxes, classes = boxes[keep], classes[keep]
        if polygons is not None:
            polygons = [p for p, k in zip(polygons, keep) if k]
        if keypoints is not None and len(keypoints):
            keypoints = keypoints[keep]
    out = {"boxes": boxes, "classes": classes}
    if polygons is not None:
        out["polygons"] = polygons
    if keypoints is not None:
        out["keypoints"] = keypoints
    return out


class DatasetMapper:
    """cfg -> callable(dataset_dict, rng) -> sample dict of numpy arrays:
    image, [image_trgt], boxes (N,4), classes (N,), hw, orig_hw, image_id."""

    def __init__(self, cfg, is_train: bool = True, augmentations=None):
        """`augmentations`: explicit Augmentation list overriding the
        cfg-built pipeline (the reference DatasetMapper(augmentations=...)
        path used by LazyConfig recipes, e.g. the new_baselines LSJ augs)."""
        self.is_train = is_train
        self.augmentations = (
            list(augmentations) if augmentations is not None else build_augmentation(cfg, is_train)
        )
        self.image_format = cfg.INPUT.FORMAT
        self.use_instance_mask = cfg.MODEL.MASK_ON
        self.use_keypoint = cfg.MODEL.KEYPOINT_ON
        # precomputed proposals ride the same TransformList
        # (reference detection_utils.py transform_proposals)
        self.load_proposals = cfg.MODEL.LOAD_PROPOSALS
        self.proposal_topk = (
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
            if is_train
            else cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        )
        self._hflip_indices = None
        if self.use_keypoint:
            # (reference DatasetMapper.from_config: keypoint_hflip_indices
            # from the train datasets' keypoint_flip_map metadata)
            from .catalog import MetadataCatalog
            from .transforms import create_keypoint_hflip_indices

            names = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
            if names:
                meta = MetadataCatalog.get(names[0])
                if meta.get("keypoint_names"):
                    self._hflip_indices = create_keypoint_hflip_indices(meta)

    def __call__(self, dataset_dict: dict, rng: np.random.RandomState) -> dict:
        d = dict(dataset_dict)
        image = read_image(d["file_name"], self.image_format)
        orig_hw = image.shape[:2]

        image, tfms = apply_augmentations(self.augmentations, image, rng)
        hw = image.shape[:2]

        out = {
            "image": image,
            "hw": np.asarray(hw, np.int32),
            "orig_hw": np.asarray(orig_hw, np.int32),
            "image_id": d.get("image_id"),
        }

        if self.load_proposals:
            from .proposals import transform_proposals

            out.update(transform_proposals(d, hw, tfms, self.proposal_topk))

        # paired translated view: same transforms (reference :159-161)
        if "data_dt_file_name" in d:
            image_t = read_image(d["data_dt_file_name"], self.image_format)
            if image_t.shape[:2] != orig_hw:  # twins are pixel-aligned; guard anyway
                image_t = np.asarray(
                    Image.fromarray(image_t).resize((orig_hw[1], orig_hw[0]))
                )
            out["image_trgt"] = tfms.apply_image(image_t)

        if "annotations" in d:
            # difficult instances are excluded from training (d2 VOC convention)
            annos = [a for a in d["annotations"] if not (self.is_train and a.get("difficult", 0))]
            t = _transform_annotations(
                annos, tfms, hw, with_masks=self.use_instance_mask,
                with_keypoints=self.use_keypoint, hflip_indices=self._hflip_indices,
            )
            out.update(t)
        else:
            out.update({"boxes": np.zeros((0, 4), np.float32), "classes": np.zeros((0,), np.int32)})
            if self.use_instance_mask:
                out["polygons"] = []
            if self.use_keypoint:
                out["keypoints"] = np.zeros((0, 0, 3), np.float32)
        return out


class DatasetMapperTwoCropSeparate:
    """Mean-teacher two-crop mapper (reference dataset_mapper.py:403-569):
    one geometric transform, two photometric views (strong, weak)."""

    def __init__(self, cfg, is_train: bool = True):
        self.base = DatasetMapper(cfg, is_train)
        self.strong_aug = build_strong_augmentation_fn()

    def __call__(self, dataset_dict: dict, rng: np.random.RandomState):
        weak = self.base(dataset_dict, rng)
        strong = dict(weak)
        strong["image"] = self.strong_aug(weak["image"], rng)
        if "image_trgt" in weak:
            strong["image_trgt"] = self.strong_aug(weak["image_trgt"], rng)
        return strong, weak


class SemSegDatasetMapper:
    """Semantic-segmentation mapper (reference DatasetMapper's
    sem_seg_file_name branch): image + labelTrainIds PNG through the shared
    geometric transforms (NEAREST for the label map); no instances."""

    def __init__(self, cfg, is_train: bool = True):
        self.is_train = is_train
        self.augmentations = build_augmentation(cfg, is_train)
        self.image_format = cfg.INPUT.FORMAT

    def __call__(self, dataset_dict: dict, rng: np.random.RandomState) -> dict:
        d = dict(dataset_dict)
        image = read_image(d["file_name"], self.image_format)
        orig_hw = image.shape[:2]
        image, tfms = apply_augmentations(self.augmentations, image, rng)
        sem = np.asarray(Image.open(d["sem_seg_file_name"]), np.int32)
        sem_t = tfms.apply_segmentation(sem)
        return {
            "image": image,
            "hw": np.asarray(image.shape[:2], np.int32),
            "orig_hw": np.asarray(orig_hw, np.int32),
            "image_id": d.get("image_id"),
            "boxes": np.zeros((0, 4), np.float32),
            "classes": np.zeros((0,), np.int32),
            "sem_seg": sem_t.astype(np.int32),
        }


class PanopticDatasetMapper:
    """Panoptic training mapper (reference dataset_mapper.py panoptic path):
    reads the image + panoptic PNG, applies the shared geometric transforms,
    and emits the detection sample (thing boxes from segments_info) plus a
    `sem_seg` stuff-class target derived from the PNG."""

    def __init__(self, cfg, is_train: bool = True):
        self.is_train = is_train
        self.augmentations = build_augmentation(cfg, is_train)
        self.image_format = cfg.INPUT.FORMAT
        self.ignore_label = cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE
        # MASK_ON: thing instance masks cut from the panoptic id map ride
        # along as bitmasks (reference panoptic training uses the instances
        # json; the id map carries identical pixel sets)
        self.use_instance_mask = cfg.MODEL.MASK_ON

    def __call__(self, dataset_dict: dict, rng: np.random.RandomState) -> dict:
        from .datasets.coco_panoptic import panoptic_png_to_sem_seg, rgb2id

        d = dict(dataset_dict)
        image = read_image(d["file_name"], self.image_format)
        orig_hw = image.shape[:2]
        image, tfms = apply_augmentations(self.augmentations, image, rng)
        hw = image.shape[:2]

        pan = np.asarray(Image.open(d["pan_seg_file_name"]).convert("RGB"))
        sem = panoptic_png_to_sem_seg(pan, d["segments_info"], self.ignore_label)
        sem_t = tfms.apply_segmentation(sem)  # NEAREST resampling
        ids_t = None
        if self.use_instance_mask:
            # transform the id map once with the same NEAREST semantics
            ids_t = tfms.apply_segmentation(rgb2id(pan).astype(np.int32))

        boxes, classes, seg_ids = [], [], []
        for seg in d["segments_info"]:
            if seg["isthing"] and seg.get("bbox") is not None:
                x, y, w, h = seg["bbox"]
                boxes.append([x, y, x + w, y + h])
                classes.append(seg["category_id"])
                seg_ids.append(seg["id"])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        classes = np.asarray(classes, np.int32).reshape(-1)
        seg_ids = np.asarray(seg_ids, np.int32).reshape(-1)
        if len(boxes):
            boxes = tfms.apply_box(boxes)
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, hw[1])
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, hw[0])
            keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            boxes, classes, seg_ids = boxes[keep], classes[keep], seg_ids[keep]
        out = {
            "image": image,
            "hw": np.asarray(hw, np.int32),
            "orig_hw": np.asarray(orig_hw, np.int32),
            "image_id": d.get("image_id"),
            "boxes": boxes,
            "classes": classes,
            "sem_seg": sem_t.astype(np.int32),
        }
        if ids_t is not None:
            out["bitmasks"] = [
                (ids_t == sid).astype(np.float32) for sid in seg_ids
            ]
        return out
