"""Deterministic synthetic datasets for the golden-metric harness.

The reference's quick_schedules configs (configs/quick_schedules/*, checked
by TEST.EXPECTED_RESULTS via evaluation/testing.py:20-60) run against tiny
real datasets (coco_2017_val_100). This environment has no datasets on disk,
so the harness generates a deterministic on-disk VOC-style fixture instead:
same seed -> byte-identical images and annotations -> metric regressions in
NMS/sampling/box numerics fail loudly.
"""

import os
from typing import List, Optional, Tuple

import numpy as np

from .voc import register_pascal_DG, register_pascal_voc

# boxes stay inside the image and are comfortably separable
_FIXTURE_HW = (100, 140)


def make_synthetic_voc(root: str, n: int = 6, seed: int = 0, classes: Tuple[str, ...] = ("dog", "cat")) -> str:
    """Write a deterministic VOC2007-layout dataset (+ dt_clipart twin) under
    `root`. Returns the VOC2007 directory. Images contain a bright rectangle
    exactly where each GT box is, so a detector can overfit in tens of
    iterations — giving a non-trivial pinned AP for training_acc tests."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    voc = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(voc, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(voc, "ImageSets", "Main"), exist_ok=True)
    dt = os.path.join(root, "dt_clipart", "VOC2007", "JPEGImages")
    os.makedirs(dt, exist_ok=True)
    h, w = _FIXTURE_HW
    ids = []
    for i in range(n):
        fid = f"{i:06d}"
        ids.append(fid)
        img = (rng.rand(h, w, 3) * 60).astype(np.uint8)  # dark noise background
        objs = []
        for j in range(rng.randint(1, 3)):
            bw = int(30 + rng.rand() * 40)
            bh = int(25 + rng.rand() * 35)
            x1 = int(rng.rand() * (w - bw - 2)) + 1
            y1 = int(rng.rand() * (h - bh - 2)) + 1
            cls = classes[int(rng.randint(len(classes)))]
            # bright class-coded rectangle = the "object"
            color = 255 if cls == classes[0] else 160
            img[y1 : y1 + bh, x1 : x1 + bw] = color
            objs.append((cls, x1, y1, x1 + bw, y1 + bh))
        Image.fromarray(img).save(os.path.join(voc, "JPEGImages", fid + ".jpg"))
        Image.fromarray(255 - img).save(os.path.join(dt, fid + ".jpg"))
        parts = [f"<annotation><size><width>{w}</width><height>{h}</height></size>"]
        for cls, x1, y1, x2, y2 in objs:
            parts.append(
                f"<object><name>{cls}</name><difficult>0</difficult>"
                f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            )
        parts.append("</annotation>")
        with open(os.path.join(voc, "Annotations", fid + ".xml"), "w") as f:
            f.write("\n".join(parts))
    for split in ("trainval", "test"):
        with open(os.path.join(voc, "ImageSets", "Main", split + ".txt"), "w") as f:
            f.write("\n".join(ids))
    return voc


def register_synthetic_quick(root: str, prefix: str = "synthetic_voc") -> None:
    """Create the fixture under `root` and register `{prefix}_trainval` (DG
    pair), `{prefix}_trainval_plain` and `{prefix}_test` in the catalogs."""
    from ..catalog import DatasetCatalog

    voc = make_synthetic_voc(root)
    for name, fn in (
        (f"{prefix}_trainval", lambda: register_pascal_DG(f"{prefix}_trainval", voc, "trainval", 2007, "dt_clipart")),
        (f"{prefix}_trainval_plain", lambda: register_pascal_voc(f"{prefix}_trainval_plain", voc, "trainval", 2007)),
        (f"{prefix}_test", lambda: register_pascal_voc(f"{prefix}_test", voc, "test", 2007)),
    ):
        if name not in DatasetCatalog:
            fn()


def make_synthetic_coco(
    root: str,
    n: int = 6,
    seed: int = 0,
    classes: Tuple[str, ...] = ("dog", "cat"),
    with_keypoints: bool = False,
) -> Tuple[str, str]:
    """Write a deterministic COCO-JSON dataset under `root`: images with one
    bright DIAMOND per object (so the mask differs from the box and a mask
    head can overfit the shape), polygon segmentations, and (optionally)
    3 visible keypoints per object at fixed box-relative positions. Returns
    (json_path, image_root)."""
    import json

    from PIL import Image

    rng = np.random.RandomState(seed)
    img_root = os.path.join(root, "coco_synth", "images")
    os.makedirs(img_root, exist_ok=True)
    h, w = _FIXTURE_HW
    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        img = (rng.rand(h, w, 3) * 60).astype(np.uint8)
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg", "height": h, "width": w})
        for _ in range(rng.randint(1, 3)):
            bw = int(34 + rng.rand() * 36)
            bh = int(30 + rng.rand() * 30)
            x1 = int(rng.rand() * (w - bw - 2)) + 1
            y1 = int(rng.rand() * (h - bh - 2)) + 1
            cid = int(rng.randint(len(classes)))
            cx, cy = x1 + bw / 2.0, y1 + bh / 2.0
            # diamond polygon (midpoints of the box edges)
            poly = [cx, y1, x1 + bw, cy, cx, y1 + bh, x1, cy]
            yy, xx = np.mgrid[0:h, 0:w]
            inside = (np.abs(xx + 0.5 - cx) / (bw / 2.0) + np.abs(yy + 0.5 - cy) / (bh / 2.0)) <= 1.0
            img[inside] = 255 if cid == 0 else 160
            ann = {
                "id": ann_id,
                "image_id": i + 1,
                "category_id": cid + 1,
                "bbox": [x1, y1, bw, bh],
                "area": bw * bh / 2.0,
                "iscrowd": 0,
                "segmentation": [poly],
            }
            if with_keypoints:
                # 3 keypoints at fixed box-relative spots; mark them with
                # distinctive dots so the heatmap head can localize them
                kps = [
                    (x1 + 0.25 * bw, y1 + 0.25 * bh),
                    (cx, cy),
                    (x1 + 0.75 * bw, y1 + 0.75 * bh),
                ]
                flat = []
                for j, (kx, ky) in enumerate(kps):
                    ix, iy = int(kx), int(ky)
                    img[max(0, iy - 1) : iy + 2, max(0, ix - 1) : ix + 2] = (j + 1) * 60
                    flat += [float(kx), float(ky), 2]
                ann["keypoints"] = flat
                ann["num_keypoints"] = 3
            annotations.append(ann)
            ann_id += 1
        Image.fromarray(img).save(os.path.join(img_root, f"{i:06d}.jpg"))
    categories = [{"id": c + 1, "name": name} for c, name in enumerate(classes)]
    json_path = os.path.join(root, "coco_synth", "instances.json")
    with open(json_path, "w") as f:
        json.dump({"images": images, "annotations": annotations, "categories": categories}, f)
    return json_path, img_root


def make_synthetic_panoptic(root: str, n: int = 6, seed: int = 0) -> Tuple[str, str, str]:
    """Deterministic COCO-panoptic fixture: one thing rectangle per image on
    a stuff background, id-encoded panoptic PNGs + json. Returns
    (json_path, image_root, panoptic_root)."""
    import json

    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = _FIXTURE_HW
    img_dir = os.path.join(root, "pan_synth", "images")
    pan_dir = os.path.join(root, "pan_synth", "panoptic")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pan_dir, exist_ok=True)
    images, anns = [], []
    for i in range(n):
        fid = f"{i:06d}"
        img = (rng.rand(h, w, 3) * 60).astype(np.uint8)
        ids = np.full((h, w), 2, np.int32)  # stuff background
        bw, bh = 40, 32
        x0 = int(rng.rand() * (w - bw - 2)) + 1
        y0 = int(rng.rand() * (h - bh - 2)) + 1
        cat = 1 + (i % 2)
        ids[y0 : y0 + bh, x0 : x0 + bw] = 1
        img[y0 : y0 + bh, x0 : x0 + bw] = 255 if cat == 1 else 160
        Image.fromarray(img).save(os.path.join(img_dir, fid + ".jpg"))
        png = np.stack([ids % 256, ids // 256, ids // 65536], axis=-1).astype(np.uint8)
        Image.fromarray(png).save(os.path.join(pan_dir, fid + ".png"))
        images.append({"id": i, "height": h, "width": w, "file_name": fid + ".jpg"})
        anns.append(
            {
                "image_id": i,
                "file_name": fid + ".png",
                "segments_info": [
                    {"id": 1, "category_id": cat, "iscrowd": 0,
                     "bbox": [x0, y0, bw, bh], "area": bw * bh},
                    {"id": 2, "category_id": 100, "iscrowd": 0,
                     "bbox": [0, 0, w, h], "area": h * w - bw * bh},
                ],
            }
        )
    j = {
        "categories": [
            {"id": 1, "name": "thing_a", "isthing": 1},
            {"id": 2, "name": "thing_b", "isthing": 1},
            {"id": 100, "name": "stuff_x", "isthing": 0},
        ],
        "images": images,
        "annotations": anns,
    }
    json_path = os.path.join(root, "pan_synth", "panoptic.json")
    with open(json_path, "w") as f:
        json.dump(j, f)
    return json_path, img_dir, pan_dir


def register_synthetic_panoptic(root: str, prefix: str = "synthetic_panoptic") -> None:
    """Create the panoptic fixture and register `{prefix}_train`/`{prefix}_val`."""
    from ..catalog import DatasetCatalog
    from .coco_panoptic import register_coco_panoptic

    json_path, img_dir, pan_dir = make_synthetic_panoptic(root)
    for name in (f"{prefix}_train", f"{prefix}_val"):
        if name not in DatasetCatalog:
            register_coco_panoptic(name, json_path, img_dir, pan_dir)


def make_synthetic_semseg(root: str, n: int = 6, n_cls: int = 5, seed: int = 0):
    """Deterministic sem-seg fixture (cityscapes layout): vertical class
    stripes + a 255-ignore band. Returns (image_dir, gt_dir)."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    h, w = _FIXTURE_HW
    img_dir = os.path.join(root, "semseg_synth", "leftImg8bit", "val", "cityA")
    gt_dir = os.path.join(root, "semseg_synth", "gtFine", "val", "cityA")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        base = f"cityA_{i:06d}_000019"
        gt = np.zeros((h, w), np.uint8)
        for c in range(1, n_cls):
            gt[:, c * (w // n_cls) : (c + 1) * (w // n_cls)] = c
        gt[:4] = 255
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        img += (gt[..., None] % n_cls) * 40  # class-correlated intensity
        Image.fromarray(img).save(os.path.join(img_dir, base + "_leftImg8bit.png"))
        Image.fromarray(gt).save(os.path.join(gt_dir, base + "_gtFine_labelTrainIds.png"))
    return os.path.dirname(img_dir), os.path.dirname(gt_dir)


def register_synthetic_semseg(root: str, prefix: str = "synthetic_semseg", n_cls: int = 5):
    """Create the sem-seg fixture and register `{prefix}_train`/`{prefix}_val`."""
    from ..catalog import DatasetCatalog, MetadataCatalog
    from .cityscapes import load_cityscapes_semantic

    img_dir, gt_dir = make_synthetic_semseg(root, n_cls=n_cls)
    for name in (f"{prefix}_train", f"{prefix}_val"):
        if name in DatasetCatalog:
            continue
        DatasetCatalog.register(
            name, lambda i=img_dir, g=gt_dir: load_cityscapes_semantic(i, g)
        )
        MetadataCatalog.get(name).set(
            stuff_classes=[f"s{i}" for i in range(n_cls)],
            ignore_label=255,
            evaluator_type="sem_seg",
        )


def register_synthetic_coco(
    root: str, prefix: str = "synthetic_coco", with_keypoints: bool = False
) -> None:
    """Create the COCO fixture under `root` and register `{prefix}_train` /
    `{prefix}_val` (same images — the goldens overfit by design)."""
    from ..catalog import DatasetCatalog, MetadataCatalog
    from .coco import register_coco_instances

    json_path, img_root = make_synthetic_coco(root, with_keypoints=with_keypoints)
    for name in (f"{prefix}_train", f"{prefix}_val"):
        if name in DatasetCatalog:
            continue
        register_coco_instances(name, json_path, img_root)
        if with_keypoints:
            MetadataCatalog.get(name).set(
                keypoint_names=("kp_tl", "kp_center", "kp_br"),
                # kp_tl/kp_br mirror to themselves (symmetric fixture)
                keypoint_flip_map=(),
                keypoint_oks_sigmas=(0.05, 0.05, 0.05),
            )


def make_synthetic_proposals(root: str, seed: int = 1) -> str:
    """Write a d2-schema precomputed-proposal pickle for the COCO fixture
    (reference tools' proposal files consumed by build.py
    load_proposals_into_dataset): per image, the GT boxes (high objectness),
    jittered copies, and random background boxes (low objectness). Feeds the
    fast_rcnn quick schedule the way the reference's
    fast_rcnn_R_50_FPN_instant_test.yaml feeds coco_2017_val_100 proposals.
    Returns the pickle path."""
    import json
    import pickle

    json_path = os.path.join(root, "coco_synth", "instances.json")
    with open(json_path) as f:
        coco = json.load(f)
    rng = np.random.RandomState(seed)
    h, w = _FIXTURE_HW
    by_img = {}
    for a in coco["annotations"]:
        x1, y1, bw, bh = a["bbox"]
        by_img.setdefault(a["image_id"], []).append([x1, y1, x1 + bw, y1 + bh])
    ids, boxes, logits = [], [], []
    for im in coco["images"]:
        gt = np.asarray(by_img.get(im["id"], []), np.float64).reshape(-1, 4)
        props, scores = [], []
        for g in gt:
            props.append(g)
            scores.append(8.0 + rng.rand())
            for _ in range(3):  # jittered near-duplicates
                jit = g + rng.randn(4) * 3.0
                props.append(jit)
                scores.append(2.0 + rng.rand())
        for _ in range(8):  # background distractors
            x1 = rng.uniform(0, w - 20)
            y1 = rng.uniform(0, h - 20)
            props.append([x1, y1, x1 + rng.uniform(10, 40), y1 + rng.uniform(10, 30)])
            scores.append(-2.0 + rng.rand())
        b = np.clip(np.asarray(props, np.float32), 0, [w, h, w, h])
        ids.append(im["id"])
        boxes.append(b)
        logits.append(np.asarray(scores, np.float32))
    out = os.path.join(root, "coco_synth", "proposals.pkl")
    with open(out, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes, "objectness_logits": logits}, f)
    return out
