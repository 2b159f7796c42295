"""Reference-code-in-the-loop oracle for the CDDMSL headline loss.

Imports the reference's own meta_arch/rcnn.py (via tests/_reference_shim.py)
and executes its ACTUAL `v2l_contrastive` method (rcnn.py:255-319 — backbone
attnpool -> frozen ClipCap v2l -> projector -> GatherLayer -> bidirectional
InfoNCE, plus the L1 KD term against the frozen offline backbone) on a
duck-typed `self` carrying the reference's own ModifiedResNet towers,
TransformerMapper, and the rcnn.py:95-99 projector — all with random
weights. The same weights flow through checkpoint/convert_torch into our
GeneralizedRCNN, whose `caption_consistency` (models/rcnn.py:383-400) is the
rebuild of exactly this method, and the two loss scalars are pinned.

GatherLayer needs torch.distributed: a single-process gloo group makes it an
identity gather, mirroring our single-host global-view jit semantics.

Both sides consume the same raw 224x224 two-view batch: at that size the
reference's Resize(224)/CenterCrop preprocess and our _v2l_preprocess are
both the identity + CLIP normalization, so the pin isolates the loss
composition, not resize kernels (which tests/test_transforms_extra.py and
the fullscale suite cover separately).
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.distributed as tdist
from torch import nn

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _reference_shim import build_ref_pkg  # noqa: E402
from test_reference_clip_backbone_oracle import _randomize_frozen_bn  # noqa: E402

LAYERS, WIDTH, EMBED, HEADS = (1, 1, 1, 1), 16, 1024, 8
B, IMG = 4, 224
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@pytest.fixture(scope="module")
def refmods():
    mods = build_ref_pkg()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


@pytest.fixture(scope="module")
def dist_group(tmp_path_factory):
    if not tdist.is_initialized():
        f = tmp_path_factory.mktemp("pg") / "store"
        tdist.init_process_group(
            "gloo", init_method=f"file://{f}", world_size=1, rank=0
        )
    return None


def _ref_tower(refmods, seed):
    torch.manual_seed(seed)
    m = refmods.clip_backbone.ModifiedResNet(
        layers=LAYERS, output_dim=EMBED, heads=HEADS, input_resolution=IMG,
        width=WIDTH, out_features=("res4", "res5"), freeze_at=0, depth=50,
        pool_vec=False,
    )
    _randomize_frozen_bn(m, np.random.RandomState(seed))
    # torch's default conv init attenuates the input-dependent signal
    # exponentially with depth while the randomized BN biases re-inject
    # constants at every layer — res5 ends up input-independent (batch std
    # 4e-4 vs 0.25 overall) and InfoNCE degenerates to ln(B). Variance-
    # preserving init keeps the pin discriminative.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                nn.init.kaiming_normal_(mod.weight, mode="fan_out", nonlinearity="relu")
    return m.eval()


def test_v2l_contrastive_matches_reference(refmods, dist_group, rng):
    from __graft_entry__ import _flagship_cfg
    from cddmsl_tpu.checkpoint.convert_torch import convert_clip_visual, convert_clipcap_mapper
    from cddmsl_tpu.models import DetBatch, build_model
    from cddmsl_tpu.utils.testing import materialize_params
    import jax

    # ---- reference side: the actual rcnn.py v2l_contrastive ----
    ref_backbone = _ref_tower(refmods, 21)
    ref_offline = _ref_tower(refmods, 22)
    torch.manual_seed(23)
    ref_mapper = refmods.clipcap.TransformerMapper(
        dim_clip=EMBED, dim_embedding=768, prefix_length=40, clip_length=40, num_layers=2
    ).eval()
    with torch.no_grad():
        # at default init the constant prefix dominates the mapper's output
        # and every image's v2l feature is ~identical (cosine sims all
        # ~0.998) -> InfoNCE degenerates to ln(B) no matter the
        # implementation. Rescale so the loss surface is informative; the
        # SAME weights flow to both sides, so the pin stays valid.
        ref_mapper.linear.weight.mul_(20.0)
        ref_mapper.prefix_const.mul_(0.05)
    ref_projector = nn.Sequential(
        nn.Linear(768, 768), nn.ReLU(), nn.Linear(768, 256)
    ).eval()

    class _Duck:
        backbone = ref_backbone
        offline_backbone = ref_offline
        projector = ref_projector
        device = torch.device("cpu")

    def _structured_views(seed):
        """White-noise images are statistically identical, so ANY spatial
        pooling maps them to near-identical embeddings and InfoNCE
        degenerates to ln(B) on both sides. Give each image a distinct
        dominant color + gradient so the pin discriminates."""
        r = np.random.RandomState(seed)
        colors = np.asarray(
            [[220, 30, 30], [30, 220, 30], [30, 30, 220], [160, 160, 10]], np.float32
        )
        ramp = np.linspace(0, 1, IMG, dtype=np.float32)
        grads = np.stack(
            [
                np.outer(ramp, np.ones(IMG, np.float32)),
                np.outer(np.ones(IMG, np.float32), ramp),
                np.outer(ramp[::-1], np.ones(IMG, np.float32)),
                np.outer(ramp, ramp),
            ]
        )  # (B, IMG, IMG)
        imgs = r.rand(B, IMG, IMG, 3).astype(np.float32) * 40
        imgs += colors[:, None, None, :] * grads[..., None]
        return np.clip(imgs, 0, 255)

    raw_src = _structured_views(1)
    raw_trgt = _structured_views(2)

    def normalize(raw):
        x = raw / 255.0
        x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    with torch.no_grad():
        want_cont, want_kd = refmods.meta_rcnn.GeneralizedRCNN.v2l_contrastive(
            _Duck(), normalize(raw_src), normalize(raw_trgt), ref_mapper,
            KD_regularization=True,
        )

    # ---- our side: the same weights through the converter ----
    cfg = _flagship_cfg(tiny=True)
    cfg.TPU.EMBED_DIM = EMBED
    cfg.TPU.V2L_MAPPER_TOKENS = 40
    cfg.TPU.V2L_MAPPER_LAYERS = 2
    model = build_model(cfg)
    batch = DetBatch(
        image=jnp.asarray(raw_src),
        image_sizes=jnp.asarray(np.tile([[IMG, IMG]], (B, 1)), jnp.int32),
        orig_sizes=jnp.asarray(np.tile([[IMG, IMG]], (B, 1)), jnp.int32),
        gt_boxes=jnp.zeros((B, 4, 4)),
        gt_classes=jnp.zeros((B, 4), jnp.int32),
        gt_valid=jnp.zeros((B, 4), bool),
        image_trgt=jnp.asarray(raw_trgt),
    )
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all),
        jax.random.PRNGKey(0), batch,
    )
    p = params["params"] if "params" in params else params
    p["backbone"] = convert_clip_visual(
        {k: v.numpy() for k, v in ref_backbone.state_dict().items()}, ""
    )
    p["offline_backbone"] = convert_clip_visual(
        {k: v.numpy() for k, v in ref_offline.state_dict().items()}, ""
    )
    p["v2l_mapper"] = convert_clipcap_mapper(
        {f"clip_project.{k}": v.detach().numpy() for k, v in ref_mapper.state_dict().items()}
    )
    p["projector"] = {
        "fc1": {
            "kernel": jnp.asarray(ref_projector[0].weight.detach().numpy().T),
            "bias": jnp.asarray(ref_projector[0].bias.detach().numpy()),
        },
        "fc2": {
            "kernel": jnp.asarray(ref_projector[2].weight.detach().numpy().T),
            "bias": jnp.asarray(ref_projector[2].bias.detach().numpy()),
        },
    }

    losses = model.apply(params, batch, True, method=model.caption_consistency)
    got_cont = float(losses["cont_loss"])
    got_kd = float(losses["kd_loss"])

    # measured agreement is ~1e-7 on both scalars (fp32 through two entirely
    # different stacks); the tolerance is set 100x looser, and the
    # non-degeneracy bar ~10x above THAT, so a semantic difference cannot
    # hide inside the uniform-logits plateau
    np.testing.assert_allclose(got_cont, want_cont.item(), rtol=0, atol=2e-5)
    np.testing.assert_allclose(got_kd, want_kd.item(), rtol=1e-4, atol=1e-6)
    assert abs(got_cont - np.log(B)) > 2e-4  # non-degenerate logits
    assert got_kd > 0.01  # non-degenerate KD (different towers)
