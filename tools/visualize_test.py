#!/usr/bin/env python
"""Side-by-side prediction dumps over a directory of test images (the
reference root scripts visualize_test.py / visualize_test_city.py,
parameterized instead of hard-coded): for each --model name=weights, run
DefaultPredictor on every image and write overlays to
<output>/<tag>_<name>/; with --gt-xml-dir, also write a <tag>_GT/ directory
of ground-truth overlays parsed from VOC-style annotation XMLs.

  python tools/visualize_test.py --config-file configs/VOC-Experiments/\
faster_rcnn_CLIP_R_50_C4.yaml --input datasets/clipart/JPEGImages \
      --model ours=output/model_final.ckpt --model baseline=base.ckpt \
      --dataset Clipart1k_test --gt-xml-dir datasets/clipart/Annotations \
      --score-thresh 0.5 --output ./predictions --tag clipart
"""

import argparse
import glob
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _parse_voc_xml(path, class_names):
    """VOC Annotations/<id>.xml -> (boxes XYXY, class indices)."""
    root = ET.parse(path).getroot()
    boxes, classes = [], []
    for obj in root.findall("object"):
        bb = obj.find("bndbox")
        boxes.append([float(bb.find(k).text) for k in ("xmin", "ymin", "xmax", "ymax")])
        name = obj.find("name").text
        classes.append(class_names.index(name) if name in class_names else 0)
    return np.asarray(boxes, np.float32).reshape(-1, 4), np.asarray(classes, int)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--input", required=True, help="image directory or glob")
    ap.add_argument(
        "--model", action="append", default=[],
        help="name=weights_path; repeatable (reference's ours/baseline pair). "
        "When omitted, cfg.MODEL.WEIGHTS is used under the name 'model'.",
    )
    ap.add_argument("--dataset", default=None, help="metadata source (class names)")
    ap.add_argument("--gt-xml-dir", default=None, help="VOC Annotations dir for GT overlays")
    ap.add_argument("--score-thresh", type=float, default=0.5)
    ap.add_argument("--max-images", type=int, default=500)
    ap.add_argument("--output", default="./predictions")
    ap.add_argument("--tag", default="test", help="output subdirectory prefix")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from PIL import Image

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data import MetadataCatalog, register_all
    from cddmsl_tpu.engine.defaults import DefaultPredictor
    from cddmsl_tpu.utils.visualizer import Visualizer

    register_all()
    pattern = args.input if glob.has_magic(args.input) else os.path.join(args.input, "**", "*")
    files = sorted(
        f for f in glob.glob(pattern, recursive=True)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )[: args.max_images]
    if not files:
        raise SystemExit(f"no images under {args.input}")

    meta = MetadataCatalog.get(args.dataset) if args.dataset else None
    class_names = list(meta.get("thing_classes", [])) if meta else []

    models = [m.split("=", 1) for m in args.model] or [("model", None)]
    for name, weights in models:
        cfg = get_cfg()
        add_ateacher_config(cfg)
        cfg.merge_from_file(args.config_file)
        if weights:
            cfg.MODEL.WEIGHTS = weights
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.score_thresh
        if args.opts:
            cfg.merge_from_list(args.opts)
        predictor = DefaultPredictor(cfg)
        out_dir = os.path.join(args.output, f"{args.tag}_{name}")
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            img = np.asarray(Image.open(f).convert("RGB"))
            out = predictor(img)
            vis = Visualizer(img, metadata=meta)
            drawn = vis.draw_instance_predictions(
                out["boxes"], out["scores"], out["classes"], masks=out.get("masks")
            )
            drawn.save(os.path.join(out_dir, "img_" + os.path.basename(f)))
        print(f"[{name}] wrote {len(files)} overlays to {out_dir}")

    if args.gt_xml_dir:
        gt_dir = os.path.join(args.output, f"{args.tag}_GT")
        os.makedirs(gt_dir, exist_ok=True)
        n = 0
        for f in files:
            stem = os.path.splitext(os.path.basename(f))[0]
            xml = os.path.join(args.gt_xml_dir, stem + ".xml")
            if not os.path.exists(xml):
                continue
            boxes, classes = _parse_voc_xml(xml, class_names)
            img = np.asarray(Image.open(f).convert("RGB"))
            vis = Visualizer(img, metadata=meta)
            vis.draw_instance_predictions(boxes, None, classes).save(
                os.path.join(gt_dir, "img_" + os.path.basename(f))
            )
            n += 1
        print(f"[GT] wrote {n} overlays to {gt_dir}")


if __name__ == "__main__":
    main()
