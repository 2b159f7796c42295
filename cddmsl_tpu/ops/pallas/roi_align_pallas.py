"""Pallas TPU kernel for RoIAlign (forward + custom VJP backward).

The XLA formulation (ops/roi_align.py) materializes the (R, PH, W, C)
separable-interpolation intermediate in HBM. This kernel keeps the whole
feature map resident in VMEM and fuses, per ROI:
  1. interpolation-matrix construction (VPU)
  2. the H-contraction  (PH, H) @ (H, W*C)      (MXU)
  3. the W-contraction  (PW, W) @ (W, C) per row (MXU)
so the intermediate never leaves VMEM. The backward kernel accumulates
dF += Wy^T @ (Wx-contracted dOut) across the sequential TPU grid into a
single VMEM block (ROIs carry no gradient, matching torchvision).

Constraints: H*W*C*(bytes) + PH*W*C*4 must fit VMEM (~16MB/core) — true for
the C4 res4 map (50x84x1024 bf16 ~ 8.6MB). Falls back to interpret mode on
CPU for tests.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weights(start, size, pooled: int, sampling: int, dim: int):
    """(scalar start/size) -> (pooled, dim) averaged bilinear weights.
    Same math as ops/roi_align._interp_matrix for one ROI."""
    bin_size = size / pooled
    ph = jax.lax.broadcasted_iota(jnp.float32, (pooled, sampling, dim), 0)
    s = jax.lax.broadcasted_iota(jnp.float32, (pooled, sampling, dim), 1)
    grid = jax.lax.broadcasted_iota(jnp.float32, (pooled, sampling, dim), 2)
    coords = start + (ph + (s + 0.5) / sampling) * bin_size  # (P, S, dim)
    in_range = (coords > -1.0) & (coords < dim)
    cc = jnp.clip(coords, 0.0, dim - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid)) * in_range.astype(jnp.float32)
    return jnp.mean(w, axis=1)  # (P, dim)


def _fwd_kernel(rois_ref, f_ref, out_ref, *, ph, pw, sampling, scale, H, W, C):
    r = pl.program_id(0)
    x1 = rois_ref[r, 0] * scale - 0.5
    y1 = rois_ref[r, 1] * scale - 0.5
    x2 = rois_ref[r, 2] * scale - 0.5
    y2 = rois_ref[r, 3] * scale - 0.5
    wy = _weights(y1, y2 - y1, ph, sampling, H)  # (PH, H)
    wx = _weights(x1, x2 - x1, pw, sampling, W)  # (PW, W)

    f2d = f_ref[:].astype(jnp.float32).reshape(H, W * C)
    mid = jnp.dot(wy, f2d, preferred_element_type=jnp.float32)  # (PH, W*C)
    mid = mid.reshape(ph, W, C)
    for p in range(ph):  # PH small static loop; each is an MXU matmul
        out_ref[0, p] = jnp.dot(wx, mid[p], preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(rois_ref, g_ref, df_ref, *, ph, pw, sampling, scale, H, W, C):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        df_ref[:] = jnp.zeros_like(df_ref)

    x1 = rois_ref[r, 0] * scale - 0.5
    y1 = rois_ref[r, 1] * scale - 0.5
    x2 = rois_ref[r, 2] * scale - 0.5
    y2 = rois_ref[r, 3] * scale - 0.5
    wy = _weights(y1, y2 - y1, ph, sampling, H)  # (PH, H)
    wx = _weights(x1, x2 - x1, pw, sampling, W)  # (PW, W)

    g = g_ref[0].astype(jnp.float32)  # (PH, PW, C)
    # tmp[p, w, c] = sum_q Wx[q, w] g[p, q, c]
    rows = []
    for p in range(ph):
        rows.append(jnp.dot(wx.T, g[p], preferred_element_type=jnp.float32))  # (W, C)
    tmp = jnp.stack(rows, axis=0).reshape(ph, W * C)
    df = jnp.dot(wy.T, tmp, preferred_element_type=jnp.float32)  # (H, W*C)
    df_ref[:] = df_ref[:] + df.reshape(H, W, C).astype(df_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def roi_align_pallas(features, rois, output_size=(14, 14), spatial_scale=1.0 / 16, sampling_ratio=2, interpret=False):
    """features (H, W, C), rois (R, 4) -> (R, PH, PW, C). aligned=True
    semantics identical to ops/roi_align.roi_align."""
    return _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret)


def _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret):
    H, W, C = features.shape
    R = rois.shape[0]
    ph, pw = output_size
    kernel = functools.partial(
        _fwd_kernel, ph=ph, pw=pw, sampling=max(sampling_ratio, 1) if sampling_ratio else 2,
        scale=spatial_scale, H=H, W=W, C=C,
    )
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((R, 4), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H, W, C), lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ph, pw, C), lambda r: (r, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), features.dtype),
        interpret=interpret,
    )(rois.astype(jnp.float32), features)


def _fwd_rule(features, rois, output_size, spatial_scale, sampling_ratio, interpret):
    out = _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret)
    return out, (features, rois)


def _bwd_rule(output_size, spatial_scale, sampling_ratio, interpret, res, g):
    features, rois = res
    H, W, C = features.shape
    R = rois.shape[0]
    ph, pw = output_size
    kernel = functools.partial(
        _bwd_kernel, ph=ph, pw=pw, sampling=max(sampling_ratio, 1) if sampling_ratio else 2,
        scale=spatial_scale, H=H, W=W, C=C,
    )
    df = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((R, 4), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ph, pw, C), lambda r: (r, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, C), lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C), features.dtype),
        interpret=interpret,
    )(rois.astype(jnp.float32), g)
    return df, None  # no gradient w.r.t. rois (torchvision semantics)


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
