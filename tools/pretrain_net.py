#!/usr/bin/env python
"""RegionCLIP pretraining CLI over the image-text TSV corpus (reference:
tools/train_net.py with configs/pretrain/RegionCLIP_RN50.yaml, dataset branch
data/build.py:312-340).

  python tools/pretrain_net.py --config-file configs/pretrain/RegionCLIP_RN50.yaml \
      --image-tsv data/imgs.tsv --text-tsv data/texts.tsv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--image-tsv", nargs="+", required=True)
    ap.add_argument("--text-tsv", nargs="+", required=True)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.clip_datasets import CLIPImgTxtPairTSVDataset
    from cddmsl_tpu.data.clip_tokenizer import tokenize
    from cddmsl_tpu.engine.pretrain import pretrain_loop
    from cddmsl_tpu.engine.train_loop import TrainState
    from cddmsl_tpu.models.build import build_pretrain_fast_rcnn
    from cddmsl_tpu.solver import build_optimizer
    from cddmsl_tpu.utils.testing import materialize_params

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_pretrain_fast_rcnn(cfg)
    ds = CLIPImgTxtPairTSVDataset(args.image_tsv, args.text_tsv)
    print(f"pretraining corpus: {len(ds)} image-text pairs")
    batches = ds.batches(cfg.SOLVER.IMS_PER_BATCH, image_size=224, seed=max(cfg.SEED, 0))

    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    im0, boxes0, tok0 = (
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 1, 4), np.float32),
        np.zeros((1, model.text_context_length), np.int32),
    )
    if cfg.TPU.FAST_INIT:
        params = materialize_params(
            lambda r: model.init(r, im0, boxes0, tok0, method=model.pretrain_losses_with_text), rng
        )
    else:
        params = model.init(rng, im0, boxes0, tok0, method=model.pretrain_losses_with_text)
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)

    def tok(captions):
        return np.asarray(tokenize(captions, context_length=model.text_context_length))

    state, metrics = pretrain_loop(
        model, state, optimizer, batches, tok, max_iter=cfg.SOLVER.MAX_ITER,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN), pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )
    print("final:", metrics)

    if cfg.OUTPUT_DIR:
        from cddmsl_tpu.checkpoint import DetectionCheckpointer

        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
        DetectionCheckpointer(cfg.OUTPUT_DIR).save("pretrain_final", jax.device_get(state))


if __name__ == "__main__":
    main()
