#!/usr/bin/env python
"""Deployment export CLI (the reference tools/deploy/export_model.py, which
traces to TorchScript/Caffe2; here the artifact is StableHLO via jax.export —
the XLA ecosystem's stable serialized-program format, loadable from any PJRT
runtime incl. the C++ one).

  python tools/deploy/export_model.py --config-file configs/... \
      --output out_dir [--sample-height 800 --sample-width 1344] \
      [MODEL.WEIGHTS ckpt ...]

Writes: out_dir/model.stablehlo + export_meta.pkl + params.pkl, and
round-trips the artifact once to verify it loads and runs.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--output", required=True)
    ap.add_argument("--sample-height", type=int, default=800)
    ap.add_argument("--sample-width", type=int, default=1344)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import jax

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.engine.defaults import DefaultTrainer
    from cddmsl_tpu.export import export_inference, load_exported

    cfg = get_cfg()
    add_ateacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    model = trainer.eval_model
    params = jax.device_get(trainer.state.params)

    from cddmsl_tpu.models.rcnn import DetBatch

    b, h, w = args.batch, args.sample_height, args.sample_width
    example = DetBatch(
        image=np.zeros((b, h, w, 3), np.float32),
        image_sizes=np.tile([[h, w]], (b, 1)).astype(np.int32),
        orig_sizes=np.tile([[h, w]], (b, 1)).astype(np.int32),
        gt_boxes=np.zeros((b, 1, 4), np.float32),
        gt_classes=np.zeros((b, 1), np.int32),
        gt_valid=np.zeros((b, 1), bool),
    )

    def fn(p, batch):
        return model.apply(p, batch, method=model.inference)

    out = export_inference(fn, (params, example), args.output)
    with open(os.path.join(args.output, "params.pkl"), "wb") as f:
        pickle.dump(params, f)

    # round-trip check
    call = load_exported(args.output)
    det = call(params, example)
    print(f"exported to {out}; round-trip OK, boxes {det.boxes.shape}")


if __name__ == "__main__":
    main()
