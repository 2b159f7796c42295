#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint into this framework's D2ResNet
param layout (the reference tools/convert-torchvision-to-d2.py, which
renames torchvision keys to d2 naming; here the target is the flax tree).

  python tools/convert_torchvision_to_native.py r50.pth out.npz
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_torchvision_resnet(sd):
    """torchvision naming (conv1/bn1, layer{1..4}.{i}.conv{j}/bn{j},
    downsample.{0,1}) -> D2ResNet flax tree (stem_conv1/stem_bn1,
    res{2..5}_{i} with shortcut/shortcut_bn)."""
    import re

    from cddmsl_tpu.checkpoint.convert_torch import _BN_MAP, _conv, _set

    tree = {}
    for k, v in sd.items():
        v = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        if k == "conv1.weight":
            _set(tree, ("stem_conv1", "kernel"), _conv(v))
            continue
        m = re.match(r"^bn1\.(\w+)$", k)
        if m and m.group(1) in _BN_MAP:
            _set(tree, ("stem_bn1", _BN_MAP[m.group(1)]), v)
            continue
        m = re.match(r"^layer(\d)\.(\d+)\.(.+)$", k)
        if not m:
            continue
        blk = f"res{int(m.group(1)) + 1}_{m.group(2)}"
        rest = m.group(3)
        m2 = re.match(r"^(conv[123])\.weight$", rest)
        if m2:
            _set(tree, (blk, m2.group(1), "kernel"), _conv(v))
            continue
        m2 = re.match(r"^(bn[123])\.(\w+)$", rest)
        if m2 and m2.group(2) in _BN_MAP:
            _set(tree, (blk, m2.group(1), _BN_MAP[m2.group(2)]), v)
            continue
        m2 = re.match(r"^downsample\.0\.weight$", rest)
        if m2:
            _set(tree, (blk, "shortcut", "kernel"), _conv(v))
            continue
        m2 = re.match(r"^downsample\.1\.(\w+)$", rest)
        if m2 and m2.group(1) in _BN_MAP:
            _set(tree, (blk, "shortcut_bn", _BN_MAP[m2.group(1)]), v)
            continue
    return tree


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    obj = torch.load(src, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    tree = convert_torchvision_resnet(sd)
    n = sum(1 for _ in _walk(tree))
    with open(dst, "wb") as f:
        pickle.dump(tree, f)
    print(f"wrote {n} arrays to {dst}")


def _walk(t):
    for v in t.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v


if __name__ == "__main__":
    main()
