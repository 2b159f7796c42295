"""COCO panoptic dataset loader (reference detectron2/data/datasets/
coco_panoptic.py: load_coco_panoptic_json + register_coco_panoptic): the
panoptic json pairs each image with a PNG whose RGB encodes segment ids
(id = R + 256*G + 256^2*B) and per-segment category/iscrowd records.

The loader emits, per image:
  * pan_seg_file_name + segments_info (contiguous category ids, split into
    thing/stuff via `isthing`) — consumed by PanopticFPN training to derive
    the sem-seg target (`panoptic_png_to_sem_seg`) and instance boxes.
"""

import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def rgb2id(color: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) int32 segment ids (COCO panopticapi rule)."""
    color = color.astype(np.int32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def load_coco_panoptic_json(
    json_file: str, image_root: str, panoptic_root: str, dataset_name: Optional[str] = None
) -> List[dict]:
    with open(json_file) as f:
        pan = json.load(f)

    cats = sorted(pan["categories"], key=lambda c: c["id"])
    thing_ids = [c["id"] for c in cats if c.get("isthing", 0)]
    stuff_ids = [c["id"] for c in cats]  # stuff map covers all categories
    thing_map = {cid: i for i, cid in enumerate(thing_ids)}
    stuff_map = {cid: i for i, cid in enumerate(stuff_ids)}

    if dataset_name is not None:
        from ..catalog import MetadataCatalog

        meta = MetadataCatalog.get(dataset_name)
        if meta.get("thing_classes") is None:
            meta.set(
                thing_classes=[c["name"] for c in cats if c.get("isthing", 0)],
                stuff_classes=[c["name"] for c in cats],
                thing_dataset_id_to_contiguous_id=thing_map,
                stuff_dataset_id_to_contiguous_id=stuff_map,
                evaluator_type="coco_panoptic_seg",
            )

    images = {img["id"]: img for img in pan["images"]}
    dicts = []
    for ann in pan["annotations"]:
        img = images[ann["image_id"]]
        segments = []
        for seg in ann["segments_info"]:
            cid = seg["category_id"]
            segments.append(
                {
                    "id": seg["id"],
                    # thing-space id for the instance branch
                    "category_id": thing_map.get(cid, stuff_map[cid]),
                    # stuff-space id for the semantic target (all categories
                    # live in the stuff map)
                    "stuff_category_id": stuff_map[cid],
                    "isthing": cid in thing_map,
                    "iscrowd": seg.get("iscrowd", 0),
                    "bbox": seg.get("bbox"),
                    "area": seg.get("area"),
                }
            )
        dicts.append(
            {
                "file_name": os.path.join(image_root, img["file_name"]),
                "image_id": ann["image_id"],
                "height": img["height"],
                "width": img["width"],
                "pan_seg_file_name": os.path.join(panoptic_root, ann["file_name"]),
                "segments_info": segments,
            }
        )
    logger.info("Loaded %d panoptic images from %s", len(dicts), json_file)
    return dicts


def panoptic_png_to_sem_seg(
    pan_png: np.ndarray, segments_info: List[Dict], ignore_label: int = 255
) -> np.ndarray:
    """(H, W, 3) panoptic PNG + segments -> (H, W) contiguous stuff-class
    semantic map (things keep their stuff-space id; unlabeled -> ignore)."""
    ids = rgb2id(pan_png)
    out = np.full(ids.shape, ignore_label, np.int32)
    for seg in segments_info:
        # the STUFF-space id for every segment: thing-space ids would collide
        # with unrelated stuff classes when category ids interleave
        out[ids == seg["id"]] = seg.get("stuff_category_id", seg["category_id"])
    return out


def register_coco_panoptic(name: str, json_file: str, image_root: str, panoptic_root: str) -> None:
    from ..catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_json(json_file, image_root, panoptic_root, name)
    )
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, panoptic_root=panoptic_root,
        evaluator_type="coco_panoptic_seg",
    )
