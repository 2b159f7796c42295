#!/usr/bin/env python
"""ClipCap training-data prep (reference clipcap_scripts/parse_coco.py):
encode every captioned image with the (RegionCLIP-initialized) CLIP visual
tower and dump (embedding, caption) pairs for ClipCap mapper training.

TPU-native deltas: the encoder is the jitted flax ModifiedResNet
global_embed (batched, bf16-capable) instead of a per-image torch loop, and
the output is a .npz (embeddings float32 (N, D) + captions json) instead of
a torch pickle.

  python tools/clipcap_scripts/parse_coco.py \
      --captions data/coco/annotations/train_caption.json \
      --image-root data/coco/train2014 \
      --weights regionclip_pretrained-cc_rn50.pth \
      --out oscar_split_RN50_train.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--captions", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--fallback-image-root", default="")
    ap.add_argument("--weights", default="", help="RegionCLIP/CLIP torch checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from cddmsl_tpu.models.backbone.clip_resnet import (
        EMBED_DIMS,
        IMAGE_RESOLUTIONS,
        RESNET_SPECS,
        ModifiedResNet,
    )

    layers, width = RESNET_SPECS[args.depth]
    res = IMAGE_RESOLUTIONS[args.depth]
    model = ModifiedResNet(
        layers=layers, output_dim=EMBED_DIMS[args.depth],
        heads=width * 32 // 64, width=width, input_resolution=res,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, res, res, 3)))
    if args.weights:
        from cddmsl_tpu.checkpoint.convert_torch import convert_clip_visual, load_torch_state_dict

        sd = load_torch_state_dict(args.weights)
        prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else "visual."
        params = {"params": convert_clip_visual(sd, prefix)}

    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

    def preprocess(path):
        img = Image.open(path).convert("RGB")
        # CLIP preprocess: short-side bicubic resize + center crop
        s = res / min(img.size)
        img = img.resize((max(res, round(img.width * s)), max(res, round(img.height * s))),
                         Image.BICUBIC)
        left, top = (img.width - res) // 2, (img.height - res) // 2
        img = img.crop((left, top, left + res, top + res))
        return (np.asarray(img, np.float32) / 255.0 - mean) / std

    encode = jax.jit(lambda x: model.apply(params, x, method=model.global_embed))

    with open(args.captions) as f:
        data = json.load(f)
    print(f"{len(data)} captions loaded", file=sys.stderr)

    embeddings, captions = [], []
    batch_imgs, batch_meta = [], []

    def flush():
        if not batch_imgs:
            return
        x = jnp.asarray(np.stack(batch_imgs))
        emb = np.asarray(encode(x), np.float32)
        for e, d in zip(emb, batch_meta):
            d["clip_embedding"] = len(embeddings)
            embeddings.append(e)
            captions.append(d)
        batch_imgs.clear()
        batch_meta.clear()

    for d in data:
        img_id = int(d["image_id"])
        fname = os.path.join(args.image_root, f"COCO_train2014_{img_id:012d}.jpg")
        if not os.path.isfile(fname) and args.fallback_image_root:
            fname = os.path.join(args.fallback_image_root, f"COCO_val2014_{img_id:012d}.jpg")
        if not os.path.isfile(fname):
            continue
        batch_imgs.append(preprocess(fname))
        batch_meta.append(dict(d))
        if len(batch_imgs) == args.batch_size:
            flush()
    flush()

    np.savez(args.out, clip_embedding=np.stack(embeddings) if embeddings else np.zeros((0,)),
             captions=json.dumps(captions))
    print(f"{len(embeddings)} embeddings saved to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
