"""CLIP "ModifiedResNet" backbone in Flax (NHWC, TPU-native).

Re-implements the architecture of the reference's ModifiedResNet
(detectron2/modeling/backbone/clip_backbone.py:14-279):
  * 3-conv stem + avg-pool (no max-pool)
  * anti-aliasing ("blur-pool") bottlenecks: stride>1 is an AvgPool after
    conv2, and the residual downsample is AvgPool -> 1x1 conv -> BN
  * FrozenBatchNorm everywhere (folded to an affine at forward; the four
    torch buffers weight/bias/running_mean/running_var are kept as params so
    checkpoint conversion is 1:1)
  * AttentionPool2d (QKV attention pooling with a learned positional
    embedding, clip_backbone.py:73-107). The reference runs full-sequence
    self-attention and takes token 0; here only the CLS query is computed —
    mathematically identical output, ~(HW+1)x less attention FLOPs.

Layout deltas from the reference (TPU-first): NHWC instead of NCHW; compute
in `dtype` (bf16 by default) with fp32 params; stages exposed separately so
the C4 RoI head can run `layer4` (res5) + attnpool on pooled regions.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# depth -> (blocks per stage, stem width) (reference clip_backbone.py:687-713)
RESNET_SPECS = {
    50: ([3, 4, 6, 3], 64),
    101: ([3, 4, 23, 3], 64),
    200: ([4, 6, 10, 6], 80),  # "RN50x4" flag used by the reference
}
EMBED_DIMS = {50: 1024, 101: 512, 200: 640}
IMAGE_RESOLUTIONS = {50: 224, 101: 224, 200: 288}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics, folded to scale*x+shift at forward
    (reference: detectron2/layers/batch_norm.py FrozenBatchNorm2d)."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


def _conv(features: int, kernel: int, stride: int = 1, padding: int = 0, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _avg_pool(x, stride: int):
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    """CLIP bottleneck: all convs stride 1; AvgPool(stride) after conv2 when
    stride>1; residual downsample = AvgPool -> 1x1 conv -> BN
    (reference clip_backbone.py:14-70)."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x

        out = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out))
        out = _conv(self.planes, 3, padding=1, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(out)

        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = _conv(out_ch, 1, dtype=self.dtype, name="downsample_conv")(identity)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype, name="downsample_bn")(identity)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (reference clip_backbone.py:73-107).

    Query is only the mean+positional CLS token; the reference attends with
    the full sequence as query and keeps row 0, which yields the same value.
    """

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, C) -> (N, output_dim)."""
        n, h, w, c = x.shape
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=1.0 / c ** 0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
        )
        if h * w != self.spacial_dim ** 2:
            # interpolate the grid part of the positional embedding
            grid = pos[1:].reshape(self.spacial_dim, self.spacial_dim, self.embed_dim)
            grid = jax.image.resize(grid, (h, w, self.embed_dim), method="bilinear")
            pos = jnp.concatenate([pos[:1], grid.reshape(h * w, self.embed_dim)], axis=0)

        dense = lambda name: nn.Dense(
            self.embed_dim if name != "c_proj" else self.output_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

        seq = x.reshape(n, h * w, c)
        cls = jnp.mean(seq, axis=1, keepdims=True)  # (N, 1, C)
        tokens = jnp.concatenate([cls, seq], axis=1) + pos[None].astype(self.dtype)

        q = dense("q_proj")(tokens[:, :1])  # (N, 1, C) — CLS only
        k = dense("k_proj")(tokens)  # (N, L, C)
        v = dense("v_proj")(tokens)

        hd = self.embed_dim // self.num_heads
        q = q.reshape(n, 1, self.num_heads, hd)
        k = k.reshape(n, -1, self.num_heads, hd)
        v = v.reshape(n, -1, self.num_heads, hd)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / jnp.sqrt(hd).astype(attn.dtype), axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn.astype(self.dtype), v)
        out = out.reshape(n, 1, self.embed_dim)[:, 0]
        return dense("c_proj")(out)


class ModifiedResNet(nn.Module):
    """The CLIP ResNet as a detection backbone (reference
    clip_backbone.py:110-279). out_features from {stem,res2,res3,res4,res5};
    C4 configs request only res4 and run layer4 inside the RoI head via
    `res5_forward`."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    width: int = 64
    out_features: Sequence[str] = ("res4",)
    input_resolution: int = 224
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    # which stages to remat when remat=True; the early stages hold the big
    # activations — rematting layer3/4 too costs FLOPs for little memory
    remat_stages: Sequence[str] = ("layer1", "layer2")
    dtype: Any = jnp.float32

    def setup(self):
        w = self.width
        d = self.dtype

        def block_cls(stage: str):
            if self.remat and stage in self.remat_stages:
                return nn.remat(Bottleneck)
            return Bottleneck

        self.conv1 = _conv(w // 2, 3, stride=2, padding=1, dtype=d)
        self.bn1 = FrozenBatchNorm(w // 2, dtype=d)
        self.conv2 = _conv(w // 2, 3, padding=1, dtype=d)
        self.bn2 = FrozenBatchNorm(w // 2, dtype=d)
        self.conv3 = _conv(w, 3, padding=1, dtype=d)
        self.bn3 = FrozenBatchNorm(w, dtype=d)

        B1, B2, B3, B4 = (block_cls(s) for s in ("layer1", "layer2", "layer3", "layer4"))
        self.layer1 = [B1(w, 1 if i else 1, dtype=d) for i in range(self.layers[0])]
        self.layer2 = [B2(w * 2, 2 if i == 0 else 1, dtype=d) for i in range(self.layers[1])]
        self.layer3 = [B3(w * 4, 2 if i == 0 else 1, dtype=d) for i in range(self.layers[2])]
        self.layer4 = [B4(w * 8, 2 if i == 0 else 1, dtype=d) for i in range(self.layers[3])]

        embed_dim = w * 32
        self.attnpool = AttentionPool2d(
            embed_dim=embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            dtype=d,
        )

    def _stem(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(self.bn1(self.conv1(x)))
        x = nn.relu(self.bn2(self.conv2(x)))
        x = nn.relu(self.bn3(self.conv3(x)))
        return _avg_pool(x, 2)

    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        """x: (N, H, W, 3) -> dict of requested feature maps (NHWC)."""
        outputs = {}
        x = self._stem(x)
        if "stem" in self.out_features:
            outputs["stem"] = x
        for name, stage in (
            ("res2", self.layer1),
            ("res3", self.layer2),
            ("res4", self.layer3),
        ):
            for block in stage:
                x = block(x)
            if name in self.out_features:
                outputs[name] = x
        if "res5" in self.out_features:
            for block in self.layer4:
                x = block(x)
            outputs["res5"] = x
        return outputs

    def res5_forward(self, x) -> jnp.ndarray:
        """Run layer4 (res5) on pooled region features — the C4 head's shared
        stage (reference clip_roi_heads.py passes backbone.layer4 in)."""
        for block in self.layer4:
            x = block(x)
        return x

    def attnpool_forward(self, x) -> jnp.ndarray:
        """(N, H, W, 2048) -> (N, output_dim) attention-pooled embedding."""
        return self.attnpool(x)

    def global_embed(self, x) -> jnp.ndarray:
        """Full CLIP visual forward: image -> pooled embedding (the
        reference's pool_vec=True path, used by v2l / gen_captions)."""
        feats = self._stem(x.astype(self.dtype))
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            for block in stage:
                feats = block(feats)
        return self.attnpool(feats)

    @property
    def out_feature_strides(self):
        return {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}

    @property
    def out_feature_channels(self):
        w = self.width
        return {
            "stem": w,
            "res2": w * 4,
            "res3": w * 8,
            "res4": w * 16,
            "res5": w * 32,
        }


def build_clip_resnet_backbone_module(cfg) -> ModifiedResNet:
    """Config -> ModifiedResNet (reference build_clip_resnet_backbone,
    clip_backbone.py:664-729)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    layers, width = RESNET_SPECS[depth]
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return ModifiedResNet(
        layers=layers,
        output_dim=EMBED_DIMS[depth],
        heads=width * 32 // 64,
        width=width,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        input_resolution=IMAGE_RESOLUTIONS[depth],
        dtype=dtype,
    )
