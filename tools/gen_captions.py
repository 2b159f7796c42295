#!/usr/bin/env python
"""Generate a caption for an image via the ClipCap stack.

The reference gen_captions.py pipeline (SURVEY.md §3.4): RegionCLIP/CLIP
visual encoder -> 1024-d embedding -> ClipCap mapper -> GPT-2 prefix ->
autoregressive decode (greedy or top-p 0.8), stop at ".". Here decode is the
scan-based `ClipCaptionModel.generate`.

  python tools/gen_captions.py --image img.jpg \
      [--rclip-weights regionclip.pth] [--clipcap-weights clipcap.pt] \
      [--gpt2-weights gpt2_state_dict.pt] [--top-p 0.8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--rclip-weights", default="")
    ap.add_argument("--clipcap-weights", default="")
    ap.add_argument("--gpt2-weights", default="")
    ap.add_argument("--top-p", type=float, default=0.0)
    ap.add_argument("--max-len", type=int, default=67)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.models.backbone.clip_resnet import build_clip_resnet_backbone_module
    from cddmsl_tpu.models.caption import ClipCaptionModel

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"

    # image -> CLIP-normalized 224^2 tensor
    img = Image.open(args.image).convert("RGB").resize((224, 224), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = ((x - mean) / std)[None]

    backbone = build_clip_resnet_backbone_module(cfg)
    bb_params = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x), method=backbone.global_embed)
    if args.rclip_weights:
        from cddmsl_tpu.checkpoint import convert_clip_visual, load_torch_state_dict

        sd = load_torch_state_dict(args.rclip_weights)
        prefix = "visual." if any(k.startswith("visual.") for k in sd) else "backbone."
        bb_params = {"params": convert_clip_visual(sd, prefix)}
    prefix_emb = backbone.apply(bb_params, jnp.asarray(x), method=backbone.global_embed)

    model = ClipCaptionModel()
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32), prefix_emb
    )
    if args.clipcap_weights:
        from cddmsl_tpu.checkpoint import convert_clipcap_mapper, load_torch_state_dict

        sd = load_torch_state_dict(args.clipcap_weights)
        params["params"]["clip_project"] = convert_clipcap_mapper(sd)
        if args.gpt2_weights or any(k.startswith("gpt.") for k in sd):
            from cddmsl_tpu.models.gpt2 import convert_hf_gpt2

            gsd = load_torch_state_dict(args.gpt2_weights) if args.gpt2_weights else {
                k[len("gpt."):]: v for k, v in sd.items() if k.startswith("gpt.")
            }
            params["params"]["gpt"] = convert_hf_gpt2(gsd)["params"]

    from cddmsl_tpu.models.caption import generate

    tokens, valid = generate(
        model, params, prefix_emb, args.max_len, args.top_p, 1.0, jax.random.PRNGKey(2)
    )
    ids = np.asarray(tokens)[0][np.asarray(valid)[0]]
    try:
        from transformers import GPT2Tokenizer

        tok = GPT2Tokenizer.from_pretrained("gpt2")
        print(tok.decode(ids))
    except Exception:
        print("token ids (GPT-2 tokenizer unavailable offline):", ids.tolist())


if __name__ == "__main__":
    main()
