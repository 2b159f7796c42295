#!/usr/bin/env python
"""Overlay COCO-format prediction JSON onto dataset images (the reference
tools/visualize_json_results.py).

  python tools/visualize_json_results.py --input preds.json \
      --output out_dir --dataset voc_2007_test [--conf-threshold 0.5]

`preds.json`: list of {"image_id", "category_id", "bbox" [x, y, w, h],
"score"} records (the COCO results schema).
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="COCO-format predictions json")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--conf-threshold", type=float, default=0.5)
    args = ap.parse_args()

    from cddmsl_tpu.data import DatasetCatalog, MetadataCatalog
    from cddmsl_tpu.data.datasets.builtin import register_all
    from cddmsl_tpu.utils.visualizer import Visualizer

    register_all()
    dicts = DatasetCatalog.get(args.dataset)
    meta = MetadataCatalog.get(args.dataset)

    with open(args.input) as f:
        preds = json.load(f)
    by_image = defaultdict(list)
    for p in preds:
        if p.get("score", 1.0) >= args.conf_threshold:
            by_image[p["image_id"]].append(p)

    os.makedirs(args.output, exist_ok=True)
    from PIL import Image

    n_drawn = 0
    for d in dicts:
        recs = by_image.get(d["image_id"])
        if not recs:
            continue
        img = np.asarray(Image.open(d["file_name"]).convert("RGB"))
        boxes = np.asarray([r["bbox"] for r in recs], np.float32)
        boxes[:, 2:] += boxes[:, :2]  # XYWH -> XYXY
        scores = np.asarray([r.get("score", 1.0) for r in recs], np.float32)
        cats = np.asarray([r["category_id"] for r in recs], int)
        vis = Visualizer(img, metadata=meta)
        out = vis.draw_instance_predictions(boxes, scores, cats)
        out.save(os.path.join(args.output, os.path.basename(str(d["file_name"]))))
        n_drawn += 1
    print(f"wrote {n_drawn} visualizations to {args.output}")


if __name__ == "__main__":
    main()
