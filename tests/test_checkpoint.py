"""Checkpoint-converter tests: structural completeness against flax init
trees, and numeric parity against torch modules as oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cddmsl_tpu.checkpoint.convert_torch import (
    _conv,
    _dense,
    convert_clip_text,
    convert_clip_visual,
    convert_clipcap_mapper,
    detect_dialect,
)


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def test_conv_weight_conversion_numerics(rng):
    w = rng.randn(8, 4, 3, 3).astype(np.float32)
    x = rng.randn(1, 4, 10, 12).astype(np.float32)  # NCHW
    with torch.no_grad():
        conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
        conv.weight.copy_(torch.from_numpy(w))
        want = conv(torch.from_numpy(x)).numpy()  # (1, 8, 10, 12)

    from flax import linen as nn

    m = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    params = {"params": {"kernel": jnp.asarray(_conv(w))}}
    got = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))  # NHWC
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5)


def test_multihead_attention_conversion_numerics(rng):
    """torch nn.MultiheadAttention (as used by CLIP resblocks) vs our
    MultiheadAttention with converted packed qkv weights."""
    C, H, L, B = 16, 4, 5, 2
    mha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    x = rng.randn(B, L, C).astype(np.float32)
    causal = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
    with torch.no_grad():
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x), attn_mask=causal, need_weights=False)
    sd = {k: v.detach().numpy() for k, v in mha.state_dict().items()}

    from cddmsl_tpu.models.backbone.text_encoder import MultiheadAttention

    m = MultiheadAttention(width=C, heads=H)
    params = {
        "params": {
            "in_proj_weight": jnp.asarray(sd["in_proj_weight"]),
            "in_proj_bias": jnp.asarray(sd["in_proj_bias"]),
            "out_proj": {
                "kernel": jnp.asarray(_dense(sd["out_proj.weight"])),
                "bias": jnp.asarray(sd["out_proj.bias"]),
            },
        }
    }
    got = m.apply(params, jnp.asarray(x), causal=True)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_gpt2_conversion_matches_hf(rng):
    """HF GPT2LMHeadModel (built from config, no download) vs our GPT2LMHead
    with converted weights — full-stack numeric parity."""
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    hf_cfg = HFConfig(
        vocab_size=128, n_positions=32, n_embd=32, n_layer=2, n_head=4,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()
    tokens = rng.randint(0, 128, (2, 7))
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens)).logits.numpy()

    from cddmsl_tpu.models.gpt2 import GPT2Config, GPT2LMHead, convert_hf_gpt2

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_gpt2(sd)
    model = GPT2LMHead(GPT2Config(vocab_size=128, n_positions=32, n_embd=32, n_layer=2, n_head=4))
    # our model takes embeddings; reproduce the wte lookup
    emb = sd["transformer.wte.weight"][tokens]
    got, _ = model.apply(params, jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_gpt2_cached_decode_matches_uncached(rng):
    from cddmsl_tpu.models.gpt2 import GPT2Config, GPT2LMHead, init_cache

    cfg = GPT2Config(vocab_size=64, n_positions=16, n_embd=16, n_layer=2, n_head=2)
    model = GPT2LMHead(cfg)
    emb = jnp.asarray(rng.randn(1, 6, 16).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), emb)
    full, _ = model.apply(params, emb)

    caches = init_cache(cfg, 1, 6)
    logits_p, caches = model.apply(
        params, emb[:, :4], position_offset=jnp.int32(0), caches=caches, cache_index=jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :4]), rtol=1e-4, atol=1e-4)
    for i in range(4, 6):
        logits_i, caches = model.apply(
            params, emb[:, i : i + 1], position_offset=jnp.int32(i), caches=caches, cache_index=jnp.int32(i)
        )
        np.testing.assert_allclose(np.asarray(logits_i[:, 0]), np.asarray(full[:, i]), rtol=1e-4, atol=1e-4)


def test_visual_converter_structure_matches_model(rng):
    """A synthetic torch-style state dict with RN50 naming converts into
    exactly the flax ModifiedResNet tree (names + shapes)."""
    from cddmsl_tpu.models.backbone.clip_resnet import ModifiedResNet

    model = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=2, width=16, out_features=("res4",))
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    # build a fake torch sd by inverting our own layout rules
    sd = {}

    def walk(tree, tpath):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, tpath + (k,))
            else:
                sd_key = _to_torch_name(tpath + (k,))
                arr = np.asarray(v)
                if sd_key.endswith(".weight") and arr.ndim == 4:
                    arr = np.transpose(arr, (3, 2, 0, 1))
                elif "proj" in sd_key and sd_key.endswith(".weight"):
                    arr = np.transpose(arr)
                sd[sd_key] = arr

    def _to_torch_name(path):
        parts = []
        for p in path:
            import re

            m = re.match(r"^layer(\d)_(\d+)$", p)
            if m:
                parts.append(f"layer{m.group(1)}.{m.group(2)}")
            elif p == "downsample_conv":
                parts.append("downsample.0")
            elif p == "downsample_bn":
                parts.append("downsample.1")
            elif p == "kernel":
                parts.append("weight")
            else:
                parts.append(p)
        return "visual." + ".".join(parts)

    walk(params, ())
    tree = convert_clip_visual(sd, "visual.")
    assert _tree_paths(tree) == _tree_paths(params)
    for path in _tree_paths(tree):
        a = tree
        b = params
        for p in path:
            a, b = a[p], b[p]
        assert a.shape == np.asarray(b).shape, path


def test_detect_dialect():
    assert detect_dialect({"visual.conv1.weight": 0}) == "oai_clip"
    assert detect_dialect({"backbone.conv1.weight": 0}) == "d2_rcnn"
    assert detect_dialect({"clip_project.linear.weight": 0}) == "clipcap"
