"""LVIS dataset loader (reference detectron2/data/datasets/lvis.py:297
load_lvis_json + register_lvis_instances — implemented over plain json, the
`lvis` pip package is unavailable).

LVIS deltas from COCO handled here:
  * no `iscrowd`; per-image `neg_category_ids` and
    `not_exhaustive_category_ids` drive the evaluator's ignore logic
  * image file names are derived from `coco_url` (train2017/val2017 paths)
  * per-category `image_count` feeds the rare/common/frequent buckets
    (APr/APc/APf) and RepeatFactorTrainingSampler
"""

import json
import logging
import os
from collections import defaultdict
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


def load_lvis_json(json_file: str, image_root: str, dataset_name: Optional[str] = None) -> List[dict]:
    with open(json_file) as f:
        lvis = json.load(f)

    cats = sorted(lvis["categories"], key=lambda c: c["id"])
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    thing_classes = [c["name"] for c in cats]
    image_counts = [c.get("image_count", 0) for c in cats]

    if dataset_name is not None:
        from ..catalog import MetadataCatalog

        meta = MetadataCatalog.get(dataset_name)
        if meta.get("thing_classes") is None:
            meta.set(
                thing_classes=thing_classes,
                thing_dataset_id_to_contiguous_id=id_map,
                class_image_counts=image_counts,
                evaluator_type="lvis",
            )

    anns_by_image = defaultdict(list)
    for ann in lvis.get("annotations", []):
        anns_by_image[ann["image_id"]].append(ann)

    dicts = []
    for img in lvis["images"]:
        # reference lvis.py: file name from coco_url tail ('.../val2017/xxx.jpg')
        if "file_name" in img:
            file_name = img["file_name"]
        else:
            url = img["coco_url"]
            file_name = "/".join(url.split("/")[-2:])
        record = {
            "file_name": os.path.join(image_root, file_name),
            "image_id": img["id"],
            "height": img["height"],
            "width": img["width"],
            "neg_category_ids": [id_map[c] for c in img.get("neg_category_ids", []) if c in id_map],
            "not_exhaustive_category_ids": [
                id_map[c] for c in img.get("not_exhaustive_category_ids", []) if c in id_map
            ],
        }
        annos = []
        for ann in anns_by_image.get(img["id"], []):
            x, y, w, h = ann["bbox"]
            rec = {
                "category_id": id_map[ann["category_id"]],
                "bbox": [x, y, x + w, y + h],
                "bbox_mode": "XYXY_ABS",
                "iscrowd": 0,  # LVIS has no crowd annotations
            }
            if ann.get("segmentation") is not None:
                rec["segmentation"] = ann["segmentation"]
            annos.append(rec)
        record["annotations"] = annos
        dicts.append(record)
    logger.info("Loaded %d LVIS images from %s", len(dicts), json_file)
    return dicts


def register_lvis_instances(name: str, json_file: str, image_root: str) -> None:
    """reference lvis.py register_lvis_instances."""
    from ..catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(json_file=json_file, image_root=image_root, evaluator_type="lvis")
