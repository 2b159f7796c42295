#!/usr/bin/env python
"""Adverse-weather prediction visualization (reference root
visualize_test_city.py): run inference over the foggy-Cityscapes / BDD100k
test sets for one or more checkpoints ("ours" vs "baseline") and save
side-by-side prediction renders. Thin driver over visualize_test.py's logic
with the City-Experiments config defaults.

  python visualize_test_city.py --weights ours=/path/a.ckpt baseline=/path/b \
      [--datasets cityscapes_foggy_val bdd100k_val] [--n 20] [opts ...]
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CFG = os.path.join(HERE, "configs", "AdverseWeather-Experiments", "faster_rcnn_CLIP_R_50_C4.yaml")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", nargs="+", default=[], metavar="NAME=CKPT",
                    help="named checkpoints to compare (reference: ours vs baseline)")
    ap.add_argument("--datasets", nargs="+",
                    default=["cityscapes_foggy_val", "bdd100k_val"])
    ap.add_argument("--output-dir", default="./predictions_city")
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--score-thresh", type=float, default=0.5)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    runs = [w.split("=", 1) for w in args.weights] or [("model", "")]
    for name, ckpt in runs:
        for ds in args.datasets:
            out = os.path.join(args.output_dir, name, ds)
            cmd = [
                sys.executable, os.path.join(HERE, "visualize_test.py"),
                "--config-file", CFG, "--dataset", ds, "--output-dir", out,
                "--n", str(args.n),
                "MODEL.ROI_HEADS.SCORE_THRESH_TEST", str(args.score_thresh),
            ]
            if ckpt:
                cmd += ["MODEL.WEIGHTS", ckpt]
            cmd += args.opts
            print("+", " ".join(cmd), flush=True)
            rc = subprocess.call(cmd)
            if rc != 0:
                sys.exit(rc)


if __name__ == "__main__":
    main()
