"""COCO-JSON dataset loading (reference detectron2/data/datasets/coco.py:539
`load_coco_json`, without the pycocotools dependency on the load path — the
JSON is parsed directly; pycocotools is only needed for mask utilities)."""

import json
import os
from collections import defaultdict
from typing import List, Optional, Sequence


def load_coco_json(
    json_file: str,
    image_root: str,
    dataset_name: Optional[str] = None,
    filter_crowd: bool = True,
) -> List[dict]:
    with open(json_file) as f:
        coco = json.load(f)

    cats = sorted(coco["categories"], key=lambda c: c["id"])
    cat_ids = [c["id"] for c in cats]
    id_map = {cid: i for i, cid in enumerate(cat_ids)}
    thing_classes = [c["name"] for c in cats]

    if dataset_name is not None:
        from ..catalog import MetadataCatalog

        meta = MetadataCatalog.get(dataset_name)
        if meta.get("thing_classes") is None:
            meta.set(thing_classes=thing_classes, thing_dataset_id_to_contiguous_id=id_map)

    anns_by_image = defaultdict(list)
    for ann in coco.get("annotations", []):
        anns_by_image[ann["image_id"]].append(ann)

    dicts = []
    for img in coco["images"]:
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "image_id": img["id"],
            "height": img["height"],
            "width": img["width"],
        }
        annos = []
        for ann in anns_by_image.get(img["id"], []):
            if filter_crowd and ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann["bbox"]
            rec = {
                "category_id": id_map[ann["category_id"]],
                "bbox": [x, y, x + w, y + h],
                "bbox_mode": "XYXY_ABS",
                "iscrowd": ann.get("iscrowd", 0),
            }
            seg = ann.get("segmentation")
            if seg is not None:
                # polygons: list of [x0,y0,x1,y1,...] lists (RLE dicts are
                # kept verbatim for the evaluator; the mapper rasterizes
                # polygons only)
                rec["segmentation"] = seg
            kp = ann.get("keypoints")
            if kp is not None:
                # flat [x0,y0,v0,...] COCO keypoints (reference coco.py
                # keypoints handling incl. the +0.5 pixel-center shift for
                # v>0 coords is applied downstream by the mapper's
                # transform; keep raw here)
                rec["keypoints"] = kp
            annos.append(rec)
        record["annotations"] = annos
        dicts.append(record)
    return dicts


def register_coco_instances(name: str, json_file: str, image_root: str):
    from ..catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco"
    )
