"""Cityscapes instance loading + the adverse-weather DG pairing.

Mirrors the reference (detectron2/data/datasets/cityscapes.py:94-197, 384+):
boxes are derived from gtFine polygon JSONs for the 8 detection classes, and
the DG variant pairs each clear image with its synthetic-fog twin under
leftImg8bit_foggy (builtin.py:228-304).
"""

import json
import os
from typing import List, Optional, Sequence

CITYSCAPES_THING_CLASSES = (
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
)


def _poly_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    return [min(xs), min(ys), max(xs), max(ys)]


def load_cityscapes_instances(
    image_dir: str,
    gt_dir: str,
    class_names: Sequence[str] = CITYSCAPES_THING_CLASSES,
) -> List[dict]:
    """image_dir: .../leftImg8bit/<split>; gt_dir: .../gtFine/<split>."""
    dicts = []
    for city in sorted(os.listdir(image_dir)):
        city_img_dir = os.path.join(image_dir, city)
        if not os.path.isdir(city_img_dir):
            continue
        for basename in sorted(os.listdir(city_img_dir)):
            if not basename.endswith("leftImg8bit.png"):
                continue
            prefix = basename[: -len("leftImg8bit.png")]
            json_file = os.path.join(gt_dir, city, prefix + "gtFine_polygons.json")
            with open(json_file) as f:
                ann = json.load(f)
            annos = []
            for obj in ann["objects"]:
                label = obj["label"]
                if label.endswith("group"):
                    label = label[: -len("group")]
                if label not in class_names:
                    continue
                annos.append(
                    {
                        "category_id": class_names.index(label),
                        "bbox": _poly_bbox(obj["polygon"]),
                        "bbox_mode": "XYXY_ABS",
                    }
                )
            dicts.append(
                {
                    "file_name": os.path.join(city_img_dir, basename),
                    "image_id": prefix.rstrip("_"),
                    "height": ann["imgHeight"],
                    "width": ann["imgWidth"],
                    "annotations": annos,
                }
            )
    return dicts


def load_cityscapes_DG_instances(
    image_dir: str,
    gt_dir: str,
    foggy_image_dir: str,
    beta: float = 0.02,
    class_names: Sequence[str] = CITYSCAPES_THING_CLASSES,
) -> List[dict]:
    """Pairs each clear image with leftImg8bit_foggy/<...>_foggy_beta_<b>.png
    via data_dt_file_name (reference cityscapes.py:384+)."""
    dicts = load_cityscapes_instances(image_dir, gt_dir, class_names)
    for r in dicts:
        rel = os.path.relpath(r["file_name"], image_dir)
        foggy_name = rel.replace("leftImg8bit.png", f"leftImg8bit_foggy_beta_{beta}.png")
        dt_file = os.path.join(foggy_image_dir, foggy_name)
        r["data_dt_file_name"] = dt_file if os.path.exists(dt_file) else r["file_name"]
    return dicts


def register_cityscapes(name, image_dir, gt_dir, class_names=CITYSCAPES_THING_CLASSES):
    from ..catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.register(name, lambda: load_cityscapes_instances(image_dir, gt_dir, class_names))
    MetadataCatalog.get(name).set(
        thing_classes=list(class_names),
        image_dir=image_dir,
        gt_dir=gt_dir,
        evaluator_type="pascal_voc",  # the reference evaluates city with VOC AP50
    )


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    """Sem-seg dicts: each image paired with its *_gtFine_labelTrainIds.png
    (reference cityscapes.py load_cityscapes_semantic; labels are the 19
    trainIds, 255 = ignore)."""
    dicts = []
    for city in sorted(os.listdir(image_dir)):
        city_img_dir = os.path.join(image_dir, city)
        if not os.path.isdir(city_img_dir):
            continue
        for basename in sorted(os.listdir(city_img_dir)):
            if not basename.endswith("leftImg8bit.png"):
                continue
            prefix = basename[: -len("leftImg8bit.png")]
            label_file = os.path.join(gt_dir, city, prefix + "gtFine_labelTrainIds.png")
            dicts.append(
                {
                    "file_name": os.path.join(city_img_dir, basename),
                    "sem_seg_file_name": label_file,
                    "image_id": prefix.rstrip("_"),
                }
            )
    assert dicts, f"no cityscapes images under {image_dir}"
    if not os.path.isfile(dicts[0]["sem_seg_file_name"]):
        raise FileNotFoundError(
            f"{dicts[0]['sem_seg_file_name']} — generate labelTrainIds.png with "
            "cityscapesscripts createTrainIdLabelImgs.py"
        )
    return dicts


def register_cityscapes_semantic(name: str, image_dir: str, gt_dir: str) -> None:
    from ..catalog import DatasetCatalog, MetadataCatalog
    from .cityscapes_panoptic import CITYSCAPES_CATEGORIES

    DatasetCatalog.register(name, lambda: load_cityscapes_semantic(image_dir, gt_dir))
    MetadataCatalog.get(name).set(
        stuff_classes=[k["name"] for k in CITYSCAPES_CATEGORIES],
        image_dir=image_dir,
        gt_dir=gt_dir,
        ignore_label=255,
        evaluator_type="sem_seg",
    )


def register_cityscapes_DG(
    name, image_dir, gt_dir, foggy_image_dir, beta=0.02, class_names=CITYSCAPES_THING_CLASSES
):
    from ..catalog import DatasetCatalog, MetadataCatalog

    DatasetCatalog.register(
        name,
        lambda: load_cityscapes_DG_instances(image_dir, gt_dir, foggy_image_dir, beta, class_names),
    )
    MetadataCatalog.get(name).set(
        thing_classes=list(class_names),
        image_dir=image_dir,
        gt_dir=gt_dir,
        foggy_image_dir=foggy_image_dir,
        evaluator_type="pascal_voc",
    )
