"""One-time generator for the checkpoint key-census fixtures
(tests/fixtures/*_keys.txt; VERDICT round-2 item 9).

The published checkpoints' KEY NAMES are a pure function of the module
structure (layer counts), not of tensor widths — so tiny-width torch oracles
with the real RN50 / 12-layer-text / 8-layer-mapper specs enumerate exactly
the key sets of:
  * OpenAI CLIP RN50 (visual.* + text tower + logit_scale) — the
    MODEL.WEIGHTS zero-shot load path (reference clip_model_loading.py:47)
  * RegionCLIP d2-format detector (backbone.* / proposal_generator.* /
    roi_heads.* / lang_encoder.*) — the finetuned-checkpoint path
  * ClipCap transformer mapper (clip_project.* + gpt.*) — the
    VISION_TO_LANG_PATH side-load (reference train_loop.py:281-288)

Run: python tests/gen_key_census.py  (regenerates tests/fixtures/)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch
from torch import nn

from test_torch_parity import _TorchModifiedResNet, _TorchTextBlock

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def visual_keys():
    tm = _TorchModifiedResNet(layers=(3, 4, 6, 3), output_dim=8, heads=2, width=8,
                              input_resolution=224)
    return ["visual." + k for k in tm.state_dict()]


def text_keys(prefix=""):
    out = [prefix + "token_embedding.weight", prefix + "positional_embedding",
           prefix + "text_projection", prefix + "ln_final.weight", prefix + "ln_final.bias"]
    block = _TorchTextBlock(8, 2)
    for i in range(12):
        out += [f"{prefix}transformer.resblocks.{i}.{k}" for k in block.state_dict()]
    return out


class _TorchMapperLayer(nn.Module):
    """reference clipcap.py:40-110 TransformerLayer naming."""

    def __init__(self, d):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_queries = nn.Linear(d, d, bias=False)
                self.to_keys_values = nn.Linear(d, d * 2, bias=False)
                self.project = nn.Linear(d, d)

        self.attn = Attn()
        self.norm2 = nn.LayerNorm(d)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(d, d * 2)
                self.fc2 = nn.Linear(d * 2, d)

        self.mlp = Mlp()


def clipcap_keys():
    d = 8
    out = ["clip_project.linear.weight", "clip_project.linear.bias",
           "clip_project.prefix_const"]
    layer = _TorchMapperLayer(d)
    for i in range(8):
        out += [f"clip_project.transformer.layers.{i}.{k}" for k in layer.state_dict()]
    # the published ClipCap checkpoint also carries the full GPT-2 — dropped
    # by design (reference train_loop.py:281-288 keeps only clip_project)
    out += ["gpt.transformer.wte.weight", "gpt.transformer.wpe.weight",
            "gpt.transformer.h.0.ln_1.weight", "gpt.lm_head.weight"]
    return out


def regionclip_d2_keys():
    """d2-format RegionCLIP detector checkpoint (after the reference's own
    conversion; what PRE_TRAINED_RCLIP_PATH / MODEL.WEIGHTS point at)."""
    vis = [k.replace("visual.", "backbone.") for k in visual_keys()]
    lang = text_keys("lang_encoder.")
    rpn = [f"proposal_generator.rpn_head.{n}.{p}"
           for n in ("conv", "objectness_logits", "anchor_deltas")
           for p in ("weight", "bias")]
    box = ["roi_heads.box_predictor.cls_score.weight",
           "roi_heads.box_predictor.bbox_pred.weight",
           "roi_heads.box_predictor.bbox_pred.bias"]
    return vis + lang + rpn + box


def main():
    os.makedirs(FIXTURES, exist_ok=True)
    for name, keys in (
        ("clip_rn50_keys.txt", visual_keys() + text_keys() + ["logit_scale"]),
        ("regionclip_rn50_d2_keys.txt", regionclip_d2_keys()),
        ("clipcap_mapper_keys.txt", clipcap_keys()),
    ):
        path = os.path.join(FIXTURES, name)
        with open(path, "w") as f:
            f.write("\n".join(keys) + "\n")
        print(f"wrote {path} ({len(keys)} keys)")


if __name__ == "__main__":
    main()
