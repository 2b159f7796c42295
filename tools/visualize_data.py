#!/usr/bin/env python
"""Visualize training data after augmentation (reference
tools/visualize_data.py): draws GT boxes on mapped samples.

  python tools/visualize_data.py --config-file cfg.yaml --output-dir vis/ [--n 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--output-dir", default="./vis")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data import DatasetCatalog, DatasetMapper, MetadataCatalog, register_all
    from cddmsl_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    add_ateacher_config(cfg)
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    register_all()

    os.makedirs(args.output_dir, exist_ok=True)
    name = cfg.DATASETS.TRAIN[0]
    dicts = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    mapper = DatasetMapper(cfg, is_train=True)
    rng = np.random.RandomState(0)
    for i, d in enumerate(dicts[: args.n]):
        s = mapper(d, rng)
        vis = Visualizer(s["image"], meta)
        img = vis.draw_instance_predictions(s["boxes"], None, s["classes"])
        img.save(os.path.join(args.output_dir, f"{i:03d}_{s['image_id']}.jpg"))
        if "image_trgt" in s:
            vis_t = Visualizer(s["image_trgt"], meta)
            vis_t.draw_instance_predictions(s["boxes"], None, s["classes"]).save(
                os.path.join(args.output_dir, f"{i:03d}_{s['image_id']}_dt.jpg")
            )
    print(f"wrote visualizations to {args.output_dir}")


if __name__ == "__main__":
    main()
