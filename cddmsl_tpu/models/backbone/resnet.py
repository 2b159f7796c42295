"""Standard (Detectron2-style) ResNet backbone in Flax, NHWC.

Equivalent of the reference d2 ResNet (detectron2/modeling/backbone/
resnet.py:695): 7x7/2 stem + 3x3/2 max-pool, BottleneckBlocks with
stride-in-1x1 (torchvision-style when False), FrozenBN, out features
stem/res2..res5. Used for the offline LSJ RPN option of the RegionCLIP
arches (MODEL.CLIP.OFFLINE_RPN_CONFIG) and as a plain detector backbone.
"""

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.deform_conv import deform_conv2d
from .batch_norm import GroupNorm32, SyncBatchNorm
from .clip_resnet import FrozenBatchNorm, _avg_pool, _conv


def _make_norm(norm: str, features: int, dtype, name: str):
    """reference layers/batch_norm.py get_norm subset: FrozenBN (the CDDMSL
    default — also stands in for eval-mode "BN"), GN (32 groups), or SyncBN
    (trainable, running stats in the 'batch_stats' collection; batch
    statistics over the globally-sharded batch axis ARE cross-replica under
    the one jitted step — the reference NaiveSyncBatchNorm's allreduce with
    zero plumbing)."""
    if norm in ("FrozenBN", "BN", ""):
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    if norm == "GN":
        return GroupNorm32(features, dtype=dtype, name=name)
    if norm == "SyncBN":
        return SyncBatchNorm(features, axis_name=None, dtype=dtype, name=name)
    raise ValueError(f"unsupported RESNETS.NORM {norm!r} (FrozenBN/BN/GN/SyncBN)")

D2_RESNET_SPECS = {
    10: [1, 1, 1, 1],  # compile-light test depth (not in the reference table)
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


class D2Bottleneck(nn.Module):
    """reference resnet.py BottleneckBlock (+DeformBottleneckBlock when
    `deform`): 1x1 -> 3x3 (grouped for ResNeXt via NUM_GROUPS, deformable
    v1/v2 for the DCN configs) -> 1x1, norm FrozenBN or GN."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    deform: bool = False
    deform_modulated: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = _conv(self.bottleneck_channels, 1, stride=s1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_make_norm(self.norm, self.bottleneck_channels, self.dtype, "bn1")(out))
        if self.deform:
            # reference resnet.py DeformBottleneckBlock: offsets (+mask for
            # v2) predicted by a zero-init regular conv at conv2's stride, so
            # the block IS a plain conv block at init (the init-parity test
            # oracle); grouped deform convs are not supported (the reference
            # DCN configs all use NUM_GROUPS=1)
            assert self.num_groups == 1, "deform conv with NUM_GROUPS>1 unsupported"
            off_ch = (3 if self.deform_modulated else 2) * 9
            off = nn.Conv(
                off_ch, (3, 3), strides=(s3, s3),
                padding=[(self.dilation, self.dilation)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                dtype=self.dtype, param_dtype=jnp.float32, name="conv2_offset",
            )(out)
            kernel = self.param(
                "conv2_kernel",
                nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                (3, 3, self.bottleneck_channels, self.bottleneck_channels),
            )
            off = off.astype(jnp.float32)
            if self.deform_modulated:
                offsets, mask = off[..., : 2 * 9], jax.nn.sigmoid(off[..., 2 * 9 :])
            else:
                offsets, mask = off, None
            out = deform_conv2d(
                out.astype(jnp.float32), offsets, kernel, mask=mask,
                stride=s3, padding=self.dilation, dilation=self.dilation,
            ).astype(self.dtype)
        else:
            out = nn.Conv(
                self.bottleneck_channels,
                (3, 3),
                strides=(s3, s3),
                padding=[(self.dilation, self.dilation)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.num_groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv2",
            )(out)
        out = nn.relu(_make_norm(self.norm, self.bottleneck_channels, self.dtype, "bn2")(out))
        out = _conv(self.out_channels, 1, dtype=self.dtype, name="conv3")(out)
        out = _make_norm(self.norm, self.out_channels, self.dtype, "bn3")(out)

        if self.stride > 1 or x.shape[-1] != self.out_channels:
            sc = _conv(self.out_channels, 1, stride=self.stride, dtype=self.dtype, name="shortcut")(x)
            sc = _make_norm(self.norm, self.out_channels, self.dtype, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class D2BasicBlock(nn.Module):
    """Two-3x3-conv residual block for ResNet-18/34 (reference
    modeling/backbone/resnet.py BasicBlock)."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = _conv(self.out_channels, 3, stride=self.stride, padding=1, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn1")(out))
        out = _conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="bn2")(out)
        sc = x
        if self.stride > 1 or x.shape[-1] != self.out_channels:
            sc = _conv(self.out_channels, 1, stride=self.stride, dtype=self.dtype, name="shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="shortcut_bn")(sc)
        return nn.relu(out + sc)


class D2ResNet(nn.Module):
    depth: int = 50
    out_features: Sequence[str] = ("res4",)
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    num_groups: int = 1  # ResNeXt cardinality (RESNETS.NUM_GROUPS)
    width_per_group: int = 64
    norm: str = "FrozenBN"  # RESNETS.NORM: FrozenBN/BN/GN/SyncBN
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    dtype: Any = jnp.float32

    @property
    def use_basic_block(self) -> bool:
        # reference resnet.py: depth 18/34 use BasicBlock and RES2_OUT=64
        return self.depth in (18, 34)

    def setup(self):
        d = self.dtype
        self._stem_conv = nn.Conv(
            self.stem_out_channels, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=d, param_dtype=jnp.float32, name="stem_conv1",
        )
        self._stem_bn = _make_norm(self.norm, self.stem_out_channels, d, "stem_bn1")
        blocks = D2_RESNET_SPECS[self.depth]
        basic = self.use_basic_block
        out_ch = 64 if basic else self.res2_out_channels
        # reference resnet.py build_resnet_backbone: bottleneck width =
        # NUM_GROUPS * WIDTH_PER_GROUP (64 for R50, 32*8=256 for X101_32x8d)
        bottleneck_ch = self.num_groups * self.width_per_group
        stages = {}
        for stage_idx, (name, n_blocks) in enumerate(
            zip(("res2", "res3", "res4", "res5"), blocks)
        ):
            stride = 1 if stage_idx == 0 else 2
            dilation = self.res5_dilation if name == "res5" else 1
            if name == "res5" and self.res5_dilation > 1:
                stride = 1
            stage = []
            for b in range(n_blocks):
                if basic:
                    stage.append(D2BasicBlock(
                        out_channels=out_ch,
                        stride=stride if b == 0 else 1,
                        dtype=d,
                        name=f"{name}_{b}",
                    ))
                else:
                    stage.append(D2Bottleneck(
                        bottleneck_channels=bottleneck_ch,
                        out_channels=out_ch,
                        stride=stride if b == 0 else 1,
                        stride_in_1x1=self.stride_in_1x1,
                        dilation=dilation,
                        num_groups=self.num_groups,
                        norm=self.norm,
                        deform=bool(self.deform_on_per_stage[stage_idx]),
                        deform_modulated=self.deform_modulated,
                        dtype=d,
                        name=f"{name}_{b}",
                    ))
            stages[name] = stage
            out_ch *= 2
            bottleneck_ch *= 2
        self._stages = stages

    def _stem(self, x):
        x = self._stem_conv(x.astype(self.dtype))
        x = nn.relu(self._stem_bn(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = self._stem(x)
        outputs = {}
        if "stem" in self.out_features:
            outputs["stem"] = x
        # res5 runs only when requested — C4 heads run it on pooled crops
        # via `res5_forward` (same sharing as the CLIP backbone)
        last = "res5" if "res5" in self.out_features else "res4"
        for name in ("res2", "res3", "res4", "res5"):
            for block in self._stages[name]:
                x = block(x)
            if name in self.out_features:
                outputs[name] = x
            if name == last:
                break
        return outputs

    def res5_forward(self, x) -> jnp.ndarray:
        """Run the res5 stage on pooled region crops (C4 RoI heads)."""
        for block in self._stages["res5"]:
            x = block(x)
        return x

    @property
    def out_feature_strides(self):
        # res5 keeps stride 16 under RES5_DILATION=2 (the DC5 family)
        res5 = 16 if self.res5_dilation > 1 else 32
        return {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": res5}


class FPN(nn.Module):
    """Feature Pyramid Network (reference backbone/fpn.py:277): lateral 1x1 +
    3x3 output convs, top-down nearest upsampling, optional top block
    (maxpool p6, or the RetinaNet-style learned p6/p7 convs of
    fpn.py LastLevelP6P7)."""

    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    fuse_type: str = "sum"
    top_block_p6: bool = True
    # "" -> legacy behavior (maxpool extra level iff top_block_p6);
    # "p6p7" -> two learned stride-2 3x3 convs from the LAST bottom-up
    # feature (reference LastLevelP6P7, in_feature="res5" for RetinaNet:
    # p6 = conv(res5), p7 = conv(relu(p6)))
    top_block: str = ""
    norm: str = ""  # MODEL.FPN.NORM ("", "GN" or "SyncBN"; convs drop bias when set)
    dtype: Any = jnp.float32

    def _norm(self, x, name):
        if self.norm == "GN":
            return GroupNorm32(self.out_channels, dtype=self.dtype, name=name)(x)
        if self.norm == "SyncBN":
            return SyncBatchNorm(
                self.out_channels, axis_name=None, dtype=self.dtype, name=name
            )(x)
        return x

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = [bottom_up[f] for f in self.in_features]
        laterals = [
            self._norm(
                nn.Conv(self.out_channels, (1, 1), use_bias=(self.norm == ""),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lateral_{f}")(x.astype(self.dtype)),
                f"lateral_{f}_gn",
            )
            for f, x in zip(self.in_features, feats)
        ]
        # top-down pathway
        results = [laterals[-1]]
        for lat in laterals[-2::-1]:
            top = results[0]
            up = jax.image.resize(
                top, (top.shape[0], lat.shape[1], lat.shape[2], top.shape[3]), method="nearest"
            )
            fused = lat + up
            if self.fuse_type == "avg":
                fused = fused / 2.0
            results.insert(0, fused)
        outputs = {}
        for i, (f, r) in enumerate(zip(self.in_features, results)):
            p_name = f"p{i + 2}"
            outputs[p_name] = self._norm(
                nn.Conv(
                    self.out_channels, (3, 3), padding=1, use_bias=(self.norm == ""),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"output_{f}",
                )(r),
                f"output_{f}_gn",
            )
        if self.top_block == "p6p7":
            src = bottom_up[self.in_features[-1]].astype(self.dtype)
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, param_dtype=jnp.float32, name="top_block_p6",
            )(src)
            outputs[f"p{len(self.in_features) + 2}"] = p6
            outputs[f"p{len(self.in_features) + 3}"] = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, param_dtype=jnp.float32, name="top_block_p7",
            )(nn.relu(p6))
        elif self.top_block_p6:
            last = outputs[f"p{len(self.in_features) + 1}"]
            outputs[f"p{len(self.in_features) + 2}"] = nn.max_pool(
                last, (1, 1), strides=(2, 2)
            )
        return outputs
