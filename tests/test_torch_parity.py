"""Torch->JAX conversion parity at the LOGIT level (VERDICT round-1 item 4).

Builds torch oracles of the public OpenAI-CLIP ModifiedResNet / text tower
(randomized weights), saves their state dicts in checkpoint naming, converts
with cddmsl_tpu.checkpoint.convert_torch, and asserts the flax forward
agrees numerically — end-to-end through stem, blur-pool bottlenecks,
AttentionPool2d (incl. the single-query optimization vs torch's
full-sequence F.multi_head_attention_forward) and the causal text encoder.
Reference checkpoint naming: detectron2/checkpoint/clip_model_loading.py.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.checkpoint.convert_torch import (  # noqa: E402
    convert_clip_text,
    convert_clip_visual,
)
from cddmsl_tpu.models.backbone.clip_resnet import ModifiedResNet  # noqa: E402
from cddmsl_tpu.models.backbone.text_encoder import CLIPTextEncoder  # noqa: E402


# ---------------- torch oracle: CLIP ModifiedResNet (public arch) ----------------
class _TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        self.stride = stride
        if stride > 1 or inplanes != planes * 4:
            # OpenAI-CLIP key naming: "-1" avgpool, "0" conv, "1" bn — this is
            # what real checkpoints contain and what the converter expects
            from collections import OrderedDict

            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class _TorchAttnPool(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        # full-sequence attention, keep token 0 (the torch reference path)
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # (HW, N, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x, key=x, value=x,
            embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None,
            add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False, need_weights=False,
        )
        return out[0]


class _TorchModifiedResNet(nn.Module):
    def __init__(self, layers, output_dim, heads, width=16, input_resolution=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = _TorchAttnPool(input_resolution // 32, width * 32, heads, output_dim)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def stem(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        return self.avgpool(x)

    def forward(self, x):
        x = self.stem(x)
        x = self.layer1(x)
        x = self.layer2(x)
        res4 = self.layer3(x)
        res5 = self.layer4(res4)
        return res4, self.attnpool(res5)


def _randomize_bn(model, rng):
    """Random (positive-var) BN stats so FrozenBN conversion is exercised."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))


def test_visual_tower_logit_parity(rng):
    torch.manual_seed(0)
    tm = _TorchModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=8, width=16, input_resolution=64)
    _randomize_bn(tm, rng)
    tm.eval()

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want_res4, want_pool = tm(torch.from_numpy(x))

    sd = {"visual." + k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_clip_visual(sd, "visual.")}

    jm = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=8, width=16,
                        out_features=("res4",), input_resolution=64)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got_res4 = jm.apply(params, x_nhwc)["res4"]
    got_pool = jm.apply(params, x_nhwc, method=jm.global_embed)

    np.testing.assert_allclose(
        np.transpose(np.asarray(got_res4), (0, 3, 1, 2)), want_res4.numpy(), atol=2e-4, rtol=1e-3
    )
    # single-query attnpool == torch full-sequence token 0
    np.testing.assert_allclose(np.asarray(got_pool), want_pool.numpy(), atol=2e-4, rtol=1e-3)


# ---------------- torch oracle: CLIP text tower (public arch) ----------------
class _TorchTextBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, d * 4))
        self.mlp.add_module("c_proj", nn.Linear(d * 4, d))
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        h = self.ln_2(x)
        # CLIP uses QuickGELU: x * sigmoid(1.702 x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)
        return x + self.mlp.c_proj(h)


def test_text_tower_logit_parity(rng):
    torch.manual_seed(1)
    vocab, ctx, d, heads, layers, embed = 101, 12, 32, 4, 2, 24

    token_embedding = nn.Embedding(vocab, d)
    positional = nn.Parameter(torch.randn(ctx, d) * 0.01)
    blocks = nn.ModuleList([_TorchTextBlock(d, heads) for _ in range(layers)])
    ln_final = nn.LayerNorm(d)
    text_projection = nn.Parameter(torch.randn(d, embed) * 0.02)
    mask = torch.triu(torch.full((ctx, ctx), float("-inf")), diagonal=1)

    tokens = rng.randint(1, vocab - 1, (3, ctx)).astype(np.int64)
    tokens[:, -1] = vocab - 1  # eot = argmax token id
    with torch.no_grad():
        x = token_embedding(torch.from_numpy(tokens)) + positional
        x = x.permute(1, 0, 2)
        for b in blocks:
            x = b(x, mask)
        x = x.permute(1, 0, 2)
        x = ln_final(x)
        eot = torch.from_numpy(tokens).argmax(dim=-1)
        want = x[torch.arange(3), eot] @ text_projection

    sd = {"token_embedding.weight": token_embedding.weight.detach().numpy(),
          "positional_embedding": positional.detach().numpy(),
          "text_projection": text_projection.detach().numpy(),
          "ln_final.weight": ln_final.weight.detach().numpy(),
          "ln_final.bias": ln_final.bias.detach().numpy()}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"transformer.resblocks.{i}.{k}"] = v.numpy()

    params = {"params": convert_clip_text(sd, "")}
    jm = CLIPTextEncoder(vocab_size=vocab, context_length=ctx, width=d, heads=heads,
                         layers=layers, embed_dim=embed)
    got = jm.apply(params, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


# ---------------- torch oracle: d2-style ResNet (public arch) ----------------
class _TorchD2Bottleneck(nn.Module):
    """d2 BottleneckBlock with stride_in_1x1=True and checkpoint key naming
    convN.weight / convN.norm.* / shortcut.weight / shortcut.norm.*."""

    def __init__(self, in_ch, bottleneck_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, bottleneck_ch, 1, stride=stride, bias=False)
        self.conv1.norm = nn.BatchNorm2d(bottleneck_ch)
        self.conv2 = nn.Conv2d(bottleneck_ch, bottleneck_ch, 3, padding=1, bias=False)
        self.conv2.norm = nn.BatchNorm2d(bottleneck_ch)
        self.conv3 = nn.Conv2d(bottleneck_ch, out_ch, 1, bias=False)
        self.conv3.norm = nn.BatchNorm2d(out_ch)
        self.shortcut = None
        if stride > 1 or in_ch != out_ch:
            self.shortcut = nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False)
            self.shortcut.norm = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        out = F.relu(self.conv1.norm(self.conv1(x)))
        out = F.relu(self.conv2.norm(self.conv2(out)))
        out = self.conv3.norm(self.conv3(out))
        sc = self.shortcut.norm(self.shortcut(x)) if self.shortcut is not None else x
        return F.relu(out + sc)


def test_d2_resnet_converter_logit_parity(rng):
    """convert_d2_resnet (the bb_rpn_weights offline-RPN path) must map a
    d2-naming torch checkpoint onto D2ResNet with numerically identical
    forwards."""
    from cddmsl_tpu.checkpoint.convert_torch import convert_d2_resnet
    from cddmsl_tpu.models.backbone.resnet import D2ResNet

    torch.manual_seed(2)

    class _TorchD2ResNet(nn.Module):
        def __init__(self):
            super().__init__()

            class Stem(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv1 = nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
                    self.conv1.norm = nn.BatchNorm2d(8)

                def forward(self, x):
                    x = F.relu(self.conv1.norm(self.conv1(x)))
                    return F.max_pool2d(x, 3, stride=2, padding=1)

            self.stem = Stem()
            # depth-10 spec: one block per stage, d2 channel ladder from
            # stem 8 / res2 32 (width_per_group 8)
            self.res2 = nn.Sequential(_TorchD2Bottleneck(8, 8, 32, 1))
            self.res3 = nn.Sequential(_TorchD2Bottleneck(32, 16, 64, 2))
            self.res4 = nn.Sequential(_TorchD2Bottleneck(64, 32, 128, 2))
            self.res5 = nn.Sequential(_TorchD2Bottleneck(128, 64, 256, 2))

        def forward(self, x):
            x = self.stem(x)
            x = self.res2(x)
            x = self.res3(x)
            return self.res4(x)

    tm = _TorchD2ResNet()
    _randomize_bn(tm, rng)
    tm.eval()

    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {"backbone." + k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_d2_resnet(sd, "backbone.")}
    jm = D2ResNet(depth=10, out_features=("res4",), stem_out_channels=8,
                  res2_out_channels=32, width_per_group=8)
    got = jm.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))["res4"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4, rtol=1e-3
    )
