#!/usr/bin/env python
"""Run inference over a test set and save prediction visualizations
(the reference root-level visualize_test.py / visualize_test_city.py).

  python visualize_test.py --config-file cfg.yaml --dataset voc_2007_test \
      --output-dir ./predictions [--n 20] MODEL.WEIGHTS ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--dataset", default="")
    ap.add_argument("--output-dir", default="./predictions")
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data import MetadataCatalog, build_detection_test_loader, read_image
    from cddmsl_tpu.engine.defaults import DefaultTrainer
    from cddmsl_tpu.utils.visualizer import Visualizer

    cfg = get_cfg()
    add_ateacher_config(cfg)
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    dataset = args.dataset or cfg.DATASETS.TEST[0]
    meta = MetadataCatalog.get(dataset)
    loader, _ = build_detection_test_loader(cfg, dataset)

    os.makedirs(args.output_dir, exist_ok=True)
    seen = 0
    for batch, metas in loader:
        det = jax.device_get(trainer.eval_step(trainer.state.params, batch))
        for i, m in enumerate(metas):
            img = read_image(m["file_name"], cfg.INPUT.FORMAT)
            keep = det.valid[i] & (det.scores[i] > 0.5)
            vis = Visualizer(img, meta)
            out = vis.draw_instance_predictions(
                np.asarray(det.boxes[i]), np.asarray(det.scores[i]), np.asarray(det.classes[i]), np.asarray(keep)
            )
            out.save(os.path.join(args.output_dir, f"{m['image_id']}.jpg"))
            seen += 1
        if seen >= args.n:
            break
    print(f"wrote {seen} visualizations to {args.output_dir}")


if __name__ == "__main__":
    main()
