#!/usr/bin/env python
"""RegionCLIP checkpoint -> OpenAI-CLIP visual naming (reference
clipcap_scripts/RegionCLIP2CLIP.py: strips the d2 'backbone.' prefix back to
'visual.' so clip.load-style consumers can ingest RegionCLIP towers).

Here the JAX stack consumes either naming directly
(checkpoint/convert_torch.py convert_clip_visual handles both prefixes), so
this tool only re-keys a torch state dict on disk for external consumers:

  python tools/clipcap_scripts/RegionCLIP2CLIP.py in.pth out.pth
"""

import sys


def regionclip_to_clip(sd: dict) -> dict:
    """backbone.* -> visual.* (dropping non-visual keys, as the reference's
    load_state_dict(strict=False) effectively does)."""
    return {
        "visual." + k[len("backbone."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.")
    }


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj)
    out = regionclip_to_clip(sd)
    torch.save(out, dst)
    print(f"wrote {len(out)} visual.* keys to {dst}")


if __name__ == "__main__":
    main()
