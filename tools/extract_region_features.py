#!/usr/bin/env python
"""Dump per-image region features (reference tools/extract_region_features.py):
RPN proposals -> pooled res5+attnpool region embeddings saved as .npz.

  python tools/extract_region_features.py --config-file cfg.yaml \
      --dataset voc_2007_test --out feats/ [--max-images 100]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-images", type=int, default=0)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data import build_detection_test_loader, register_all
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    cfg = get_cfg()
    add_ateacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    register_all()

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    model = trainer.model
    params = trainer.state.params

    @jax.jit
    def region_features(p, batch):
        def fn(mdl, b):
            x = mdl._normalize(b.image)
            feats = mdl.backbone(x)["res4"]
            proposals, _ = mdl.proposal_generator(feats, b.image_sizes, training=False)
            emb = mdl.roi_heads._region_embed(
                feats, proposals.boxes, mdl.backbone.res5_forward, mdl.backbone.attnpool_forward
            )
            k = proposals.boxes.shape[1]
            return proposals.boxes, proposals.valid, emb.reshape(b.image.shape[0], k, -1)

        return model.apply(p, batch, method=fn)

    os.makedirs(args.out, exist_ok=True)
    loader, n = build_detection_test_loader(cfg, args.dataset)
    seen = 0
    for batch, metas in loader:
        boxes, valid, emb = jax.device_get(region_features(params, batch))
        for i, meta in enumerate(metas):
            np.savez(
                os.path.join(args.out, f"{meta['image_id']}.npz"),
                boxes=boxes[i][valid[i]],
                features=emb[i][valid[i]],
            )
            seen += 1
        if args.max_images and seen >= args.max_images:
            break
    print(f"wrote region features for {seen} images -> {args.out}")


if __name__ == "__main__":
    main()
