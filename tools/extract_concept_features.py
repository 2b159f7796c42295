#!/usr/bin/env python
"""Build a text-embedding classifier from class names.

The reference tools/extract_concept_features.py pipeline (SURVEY.md §3.3):
tokenize class names x ~80 prompt templates -> CLIP text encoder
(encode_text, only_eot) -> mean over templates -> L2 normalize -> save;
consumed as MODEL.CLIP.TEXT_EMB_PATH by the cosine classifier
(fast_rcnn.py:448-452).

Usage:
  python tools/extract_concept_features.py --config-file cfg.yaml \
      --weights regionclip.pth --out voc_20_cls_emb.npy \
      [--classes aeroplane bicycle ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--weights", default="", help="torch checkpoint with the CLIP text tower")
    ap.add_argument("--out", required=True)
    ap.add_argument("--classes", nargs="*", default=None)
    ap.add_argument("--dataset", default="", help="take class names from this registered dataset")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.clip_tokenizer import SimpleTokenizer, pre_tokenize
    from cddmsl_tpu.models.backbone.text_encoder import build_clip_text_encoder_module

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)

    if args.classes:
        class_names = args.classes
    elif args.dataset:
        from cddmsl_tpu.data import MetadataCatalog, register_all

        register_all()
        class_names = MetadataCatalog.get(args.dataset).thing_classes
    else:
        from cddmsl_tpu.data.datasets.voc import CLASS_NAMES

        class_names = list(CLASS_NAMES)

    encoder = build_clip_text_encoder_module(cfg)
    tokens = pre_tokenize(class_names)  # (C, T, 77)
    params = encoder.init(jax.random.PRNGKey(0), jnp.asarray(tokens[0]))
    if args.weights:
        from cddmsl_tpu.checkpoint import convert_clip_text, load_torch_state_dict

        sd = load_torch_state_dict(args.weights)
        prefix = "lang_encoder." if any(k.startswith("lang_encoder.") for k in sd) else ""
        tree = convert_clip_text(sd, prefix)
        params = {"params": tree} if tree else params

    encode = jax.jit(lambda t: encoder.apply(params, t))
    embs = []
    for c in range(tokens.shape[0]):
        e = np.asarray(encode(jnp.asarray(tokens[c])))  # (T, D)
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        m = e.mean(axis=0)
        embs.append(m / np.linalg.norm(m))
    out = np.stack(embs).astype(np.float32)
    if args.out.endswith(".npy"):
        np.save(args.out, out)
    else:
        import torch

        torch.save(torch.from_numpy(out), args.out)
    print(f"saved {out.shape} text embeddings for {len(class_names)} classes -> {args.out}")


if __name__ == "__main__":
    main()
