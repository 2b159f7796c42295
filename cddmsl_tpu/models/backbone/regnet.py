"""RegNet backbone in Flax, NHWC (reference detectron2/modeling/backbone/
regnet.py:452 — the AnyNet/RegNet family of "Designing Network Design
Spaces"). RegNetX = group-conv residual bottlenecks; RegNetY adds
squeeze-excitation. Stage widths/depths come from the standard quantized
linear parameterization (w_a, w_0, w_m, depth)."""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_resnet import FrozenBatchNorm, _conv


def generate_regnet_parameters(w_a: float, w_0: int, w_m: float, depth: int,
                               group_width: int) -> Tuple[Sequence[int], Sequence[int], int]:
    """Quantized linear widths -> per-stage (widths, depths) (the pycls /
    reference regnet.py generate_regnet_parameters)."""
    ws_cont = np.arange(depth) * w_a + w_0
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws_all = w_0 * np.power(w_m, ks)
    ws_all = np.round(np.divide(ws_all, 8)) * 8
    # adjust to be divisible by the group width
    ws_all = np.maximum(np.round(ws_all / group_width) * group_width, group_width)
    ws, ds = np.unique(ws_all.astype(int), return_counts=True)
    order = np.argsort(ws)  # widths increase monotonically per stage
    return ws[order].tolist(), ds[order].tolist(), group_width


class SE(nn.Module):
    """Squeeze-excitation (RegNetY)."""

    channels: int
    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="f_ex0")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="f_ex2")(s))
        return x * s


class ResBottleneckBlock(nn.Module):
    out_channels: int
    stride: int = 1
    group_width: int = 16
    bottleneck_ratio: float = 1.0
    se_ratio: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w_b = int(round(self.out_channels * self.bottleneck_ratio))
        groups = max(w_b // self.group_width, 1)
        out = _conv(w_b, 1, dtype=self.dtype, name="a")(x)
        out = nn.relu(FrozenBatchNorm(w_b, dtype=self.dtype, name="a_bn")(out))
        out = nn.Conv(
            w_b, (3, 3), strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
            feature_group_count=groups, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="b",
        )(out)
        out = nn.relu(FrozenBatchNorm(w_b, dtype=self.dtype, name="b_bn")(out))
        if self.se_ratio > 0:
            out = SE(w_b, max(int(round(x.shape[-1] * self.se_ratio)), 1), dtype=self.dtype, name="se")(out)
        out = _conv(self.out_channels, 1, dtype=self.dtype, name="c")(out)
        out = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="c_bn")(out)
        sc = x
        if self.stride > 1 or x.shape[-1] != self.out_channels:
            sc = _conv(self.out_channels, 1, stride=self.stride, dtype=self.dtype, name="proj")(x)
            sc = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="proj_bn")(sc)
        return nn.relu(out + sc)


class RegNet(nn.Module):
    """4-stage RegNet trunk with a simple 3x3/2 stem (reference regnet.py
    SimpleStem + AnyNet). out_features from {s1..s4} (strides 4..32)."""

    w_a: float = 24.48
    w_0: int = 24
    w_m: float = 2.54
    depth: int = 22
    group_width: int = 16
    se_ratio: float = 0.0  # > 0 -> RegNetY
    stem_width: int = 32
    out_features: Sequence[str] = ("s4",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        d = self.dtype
        widths, depths, gw = generate_regnet_parameters(
            self.w_a, self.w_0, self.w_m, self.depth, self.group_width
        )
        x = _conv(self.stem_width, 3, stride=2, padding=1, dtype=d, name="stem")(x.astype(d))
        x = nn.relu(FrozenBatchNorm(self.stem_width, dtype=d, name="stem_bn")(x))
        outputs = {}
        for si, (w_out, n_blocks) in enumerate(zip(widths, depths)):
            for b in range(n_blocks):
                x = ResBottleneckBlock(
                    out_channels=int(w_out),
                    stride=2 if b == 0 else 1,
                    group_width=gw,
                    se_ratio=self.se_ratio,
                    dtype=d,
                    name=f"s{si + 1}_b{b}",
                )(x)
            if f"s{si + 1}" in self.out_features:
                outputs[f"s{si + 1}"] = x
        return outputs

    @property
    def out_feature_strides(self):
        return {"s1": 4, "s2": 8, "s3": 16, "s4": 32}
