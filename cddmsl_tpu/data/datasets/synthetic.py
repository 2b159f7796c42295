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
