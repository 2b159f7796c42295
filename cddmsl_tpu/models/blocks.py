"""CNN building blocks: depthwise-separable conv and ASPP.

TPU-native counterparts of the reference layers
(detectron2/layers/blocks.py:58-111 DepthwiseSeparableConv2d,
detectron2/layers/aspp.py:14-144 ASPP). NHWC layout (house style); the
depthwise conv maps onto XLA's feature_group_count path and the dilated
3x3s stay dense MXU convs. Norm choice mirrors the reference's
`get_norm` subset that exists here: "" (bias, no norm) or "GN"
(GroupNorm32). The image-pooling branch follows the reference exactly:
global average pool (or a fixed `pool_kernel_size` window at stride 1),
1x1 conv with bias and NO norm (aspp.py:103-116), bilinear resize back
(align_corners=False — jax.image.resize half-pixel semantics match).
"""

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm(kind: str, ch: int, dtype, name: str):
    if not kind:
        return None
    if kind == "GN":
        from .backbone.batch_norm import GroupNorm32

        return GroupNorm32(ch, dtype=dtype, name=name)
    raise NotImplementedError(f"norm {kind!r} (supported: '', 'GN')")


class DepthwiseSeparableConv2d(nn.Module):
    """kxk depthwise conv + 1x1 pointwise conv (reference blocks.py:58-111).

    Norm & activation apply per-conv like the reference (Xception applies
    them on the second conv only; MobileNet on both — callers choose via
    norm1/norm2, activation1/activation2).
    """

    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    norm1: str = ""
    norm2: str = ""
    activation1: Optional[Callable] = None
    activation2: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k, p, d = self.kernel_size, self.padding, self.dilation
        x = nn.Conv(
            in_ch,
            (k, k),
            padding=p,
            kernel_dilation=(d, d),
            feature_group_count=in_ch,
            use_bias=not self.norm1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="depthwise",
        )(x)
        n1 = _norm(self.norm1, in_ch, self.dtype, "depthwise_norm")
        if n1 is not None:
            x = n1(x)
        if self.activation1 is not None:
            x = self.activation1(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            use_bias=not self.norm2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pointwise",
        )(x)
        n2 = _norm(self.norm2, self.out_channels, self.dtype, "pointwise_norm")
        if n2 is not None:
            x = n2(x)
        if self.activation2 is not None:
            x = self.activation2(x)
        return x


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (reference aspp.py:14-144).

    Five parallel branches over the input — 1x1 conv, three 3x3 atrous
    convs at `dilations`, and an image-pooling branch — concatenated and
    projected back to `out_channels` by a 1x1 conv. Branch order and the
    no-norm-on-pooling rule match the reference.
    """

    out_channels: int
    dilations: Tuple[int, int, int] = (6, 12, 18)
    norm: str = ""
    activation: Callable = jax.nn.relu
    pool_kernel_size: Optional[Tuple[int, int]] = None
    dropout: float = 0.0
    use_depthwise_separable_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        assert len(self.dilations) == 3, f"ASPP expects 3 dilations, got {self.dilations}"
        H, W = x.shape[-3], x.shape[-2]
        use_bias = self.norm == ""
        res = []

        def conv_norm_act(y, ch, ksize, dilation, name):
            y = nn.Conv(
                ch,
                (ksize, ksize),
                padding=dilation if ksize > 1 else 0,
                kernel_dilation=(dilation, dilation),
                use_bias=use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )(y)
            n = _norm(self.norm, ch, self.dtype, f"{name}_norm")
            if n is not None:
                y = n(y)
            return self.activation(y)

        res.append(conv_norm_act(x, self.out_channels, 1, 1, "conv1x1"))
        for i, d in enumerate(self.dilations):
            if self.use_depthwise_separable_conv:
                res.append(
                    DepthwiseSeparableConv2d(
                        self.out_channels,
                        kernel_size=3,
                        padding=d,
                        dilation=d,
                        norm1=self.norm,
                        norm2=self.norm,
                        activation1=self.activation,
                        activation2=self.activation,
                        dtype=self.dtype,
                        name=f"atrous{i}",
                    )(x)
                )
            else:
                res.append(conv_norm_act(x, self.out_channels, 3, d, f"atrous{i}"))

        # image pooling: global (or fixed-window) average pool -> 1x1 conv
        # with bias, NO norm (reference aspp.py:103-116) -> bilinear resize
        if self.pool_kernel_size is None:
            pooled = jnp.mean(x, axis=(-3, -2), keepdims=True)
        else:
            kh, kw = self.pool_kernel_size
            if H % kh or W % kw:
                raise ValueError(
                    f"`pool_kernel_size` {self.pool_kernel_size} must divide input {H}x{W}"
                )
            pooled = nn.avg_pool(x, (kh, kw), strides=(1, 1))
        pooled = nn.Conv(
            self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="image_pooling",
        )(pooled)
        pooled = self.activation(pooled)
        res.append(
            jax.image.resize(
                pooled, pooled.shape[:-3] + (H, W, pooled.shape[-1]), method="bilinear"
            ).astype(pooled.dtype)
        )

        out = jnp.concatenate(res, axis=-1)
        out = conv_norm_act(out, self.out_channels, 1, 1, "project")
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out
