"""Deformable convolution v1/v2 (XLA-native).

Replaces the reference's largest CUDA kernels (detectron2/layers/csrc/
deformable/deform_conv_cuda*.cu, 2888 LoC; python wrappers
layers/deform_conv.py): bilinear sampling at offset positions (gather) +
im2col contraction on the MXU. v2 ("modulated") multiplies each sampled
value by a learned mask. Used by DCN backbones
(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE); not on the CDDMSL hot path.

Layout: NHWC. offsets: (N, H, W, 2*K*K) as (dy, dx) pairs per kernel tap;
mask: (N, H, W, K*K).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); y, x (...,) -> (..., C) with zero padding outside."""
    H, W, _ = img.shape
    ok = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = (y - y0)[..., None], (x - x0)[..., None]
    v = (
        img[y0, x0] * (1 - ly) * (1 - lx)
        + img[y0, x1] * (1 - ly) * lx
        + img[y1, x0] * ly * (1 - lx)
        + img[y1, x1] * ly * lx
    )
    return v * ok[..., None]


def deform_conv2d(
    x: jnp.ndarray,  # (N, H, W, Cin)
    offsets: jnp.ndarray,  # (N, Ho, Wo, 2*K*K)
    weight: jnp.ndarray,  # (K, K, Cin, Cout) HWIO
    mask: Optional[jnp.ndarray] = None,  # (N, Ho, Wo, K*K) for v2
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns (N, Ho, Wo, Cout)."""
    n, h, w, cin = x.shape
    k = weight.shape[0]
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    assert offsets.shape[:3] == (n, ho, wo), (offsets.shape, (n, ho, wo))

    # base sampling grid: output position * stride - padding + tap * dilation
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky = jnp.arange(k) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,K,1)
    base_x = ox[None, :, None, None] + ky[None, None, None, :]  # (1,Wo,1,K)
    base_y = jnp.broadcast_to(base_y, (ho, wo, k, k)).reshape(ho, wo, k * k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, k, k)).reshape(ho, wo, k * k)

    off = offsets.reshape(n, ho, wo, k * k, 2)
    sample_y = base_y[None] + off[..., 0]
    sample_x = base_x[None] + off[..., 1]

    def per_image(img, ys, xs, m):
        vals = _bilinear_sample(img, ys, xs)  # (Ho, Wo, K*K, Cin)
        if m is not None:
            vals = vals * m[..., None]
        # im2col contraction on the MXU: (Ho*Wo, K*K*Cin) @ (K*K*Cin, Cout)
        cols = vals.reshape(ho * wo, k * k * cin)
        wmat = weight.reshape(k * k * cin, -1)
        return (cols @ wmat).reshape(ho, wo, -1)

    out = jax.vmap(per_image)(x, sample_y, sample_x, mask if mask is not None else None)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d(x, offsets, mask, weight, **kw):
    """DCNv2 (reference ModulatedDeformConv): sigmoid-activated modulation
    mask is applied by the caller per torch convention (raw mask here)."""
    return deform_conv2d(x, offsets, weight, mask=mask, **kw)
