"""Reference-code-in-the-loop oracle for the CLIP towers at FULL scale.

Round 4's full-scale parity (tests/test_torch_parity_fullscale.py) pinned the
flagship against a builder-written torch oracle; this module replaces the
oracle with the reference's OWN clip_backbone.py (imported for real via
tests/_reference_shim.py — ModifiedResNet/AttentionPool2d/CLIPLangEncoder
with their FrozenBatchNorm2d from the real detectron2/layers/batch_norm.py),
weights flowing through checkpoint/convert_torch exactly as a RegionCLIP
checkpoint load would:

  * ModifiedResNet res4 at the production 800x1344 bucket, full RN50
    (layers 3-4-6-3, width 64), randomized FrozenBN stats so mean/var
    folding bugs cannot hide (reference clip_backbone.py:110-230)
  * res5 (layer4, the anti-aliased stride-2 stage) + AttentionPool2d on
    14x14 region crops — the RoI-head path (clip_backbone.py:14-108,
    CLIPRes5ROIHeads semantics)
  * CLIPLangEncoder.encode_text at full scale (49408 vocab / 77 ctx / 12L /
    512w -> 1024) incl. the EOT-argmax projection (clip_backbone.py:732-814)

The reference Bottleneck differs from the builder oracle in no way we know
of — which is exactly what this test is for.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _reference_shim import build_ref_pkg  # noqa: E402

LAYERS, WIDTH, EMBED, HEADS = (3, 4, 6, 3), 64, 1024, 32
IMG_HW = (800, 1344)


@pytest.fixture(scope="module")
def refmods():
    mods = build_ref_pkg()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


def _randomize_frozen_bn(module, rng):
    """Default FrozenBN stats are identity-ish (mean 0 / var 1 / w 1 / b 0),
    which would HIDE converter folding bugs — randomize all four tensors."""
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            v.copy_(torch.from_numpy(rng.randn(*v.shape).astype(np.float32) * 0.2))
        elif k.endswith("running_var"):
            v.copy_(torch.from_numpy((rng.rand(*v.shape).astype(np.float32) * 1.0 + 0.5)))
        elif ".bn" in k or "downsample.1" in k:
            # FrozenBN affine weight/bias
            if k.endswith("weight"):
                v.copy_(torch.from_numpy(rng.rand(*v.shape).astype(np.float32) + 0.5))
            elif k.endswith("bias"):
                v.copy_(torch.from_numpy(rng.randn(*v.shape).astype(np.float32) * 0.1))


@pytest.fixture(scope="module")
def ref_visual(refmods):
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    m = refmods.clip_backbone.ModifiedResNet(
        layers=LAYERS,
        output_dim=EMBED,
        heads=HEADS,
        input_resolution=224,
        width=WIDTH,
        out_features=("res4",),
        freeze_at=0,
        depth=50,
        pool_vec=False,
    )
    _randomize_frozen_bn(m, rng)
    return m.eval()


@pytest.fixture(scope="module")
def our_visual(ref_visual):
    from cddmsl_tpu.checkpoint.convert_torch import convert_clip_visual
    from cddmsl_tpu.models.backbone.clip_resnet import ModifiedResNet

    sd = {"backbone." + k: v.numpy() for k, v in ref_visual.state_dict().items()}
    params = {"params": convert_clip_visual(sd, "backbone.")}
    model = ModifiedResNet(
        layers=LAYERS, output_dim=EMBED, heads=HEADS, width=WIDTH,
        out_features=("res4",), input_resolution=224,
    )
    return model, params


def test_res4_full_scale_matches_reference(ref_visual, our_visual, rng):
    model, params = our_visual
    x = (rng.randn(1, 3, *IMG_HW) * 0.7).astype(np.float32)
    with torch.no_grad():
        want = ref_visual(torch.from_numpy(x))["res4"].numpy()
    got = model.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))["res4"]
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape == (1, 1024, IMG_HW[0] // 16, IMG_HW[1] // 16)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_res5_attnpool_region_path_matches_reference(ref_visual, our_visual, rng):
    """The RoI-head path: layer4 on 14x14 region crops then AttentionPool2d
    — the reference CLIPRes5ROIHeads composition (roi_heads.py _shared_
    roi_transform), at real feature scale."""
    model, params = our_visual
    crops = (rng.randn(6, 1024, 14, 14) * 0.5).astype(np.float32)
    with torch.no_grad():
        res5 = ref_visual.layer4(torch.from_numpy(crops))
        want = ref_visual.attnpool(res5).numpy()
    crops_nhwc = jnp.asarray(np.transpose(crops, (0, 2, 3, 1)))
    got_res5 = model.apply(params, crops_nhwc, method=model.res5_forward)
    got = np.asarray(model.apply(params, got_res5, method=model.attnpool_forward))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_res5), (0, 3, 1, 2)), res5.numpy(), atol=5e-3, rtol=1e-3
    )
    assert got.shape == want.shape == (6, EMBED)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_lang_encoder_full_scale_matches_reference(refmods, rng):
    torch.manual_seed(11)
    lang = refmods.clip_backbone.CLIPLangEncoder(
        embed_dim=EMBED,
        image_resolution=224,
        vision_layers=LAYERS,
        vision_width=WIDTH,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
        out_features=None,
        freeze_at=0,
    ).eval()

    tokens = rng.randint(1, 49000, (4, 77)).astype(np.int64)
    tokens[:, 0] = 49406  # sot
    eot_pos = np.array([20, 40, 76, 7])
    for i, p in enumerate(eot_pos):
        tokens[i, p] = 49407  # eot = argmax id
        tokens[i, p + 1 :] = 0
    with torch.no_grad():
        want = lang.encode_text(torch.from_numpy(tokens)).numpy()

    from cddmsl_tpu.checkpoint.convert_torch import convert_clip_text
    from cddmsl_tpu.models.backbone.text_encoder import CLIPTextEncoder

    sd = {k: v.numpy() for k, v in lang.state_dict().items()}
    params = {"params": convert_clip_text(sd, "")}
    jm = CLIPTextEncoder(
        vocab_size=49408, context_length=77, width=512, heads=8, layers=12, embed_dim=EMBED
    )
    got = np.asarray(jm.apply(params, jnp.asarray(tokens.astype(np.int32))))
    assert got.shape == want.shape == (4, EMBED)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
