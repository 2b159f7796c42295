"""Pallas TPU kernel for RoIAlign (forward + custom VJP backward).

The XLA formulation (ops/roi_align.py) materializes the (R, PH, W, C)
separable-interpolation intermediate in HBM. This kernel keeps ONE copy of
the feature map resident in VMEM (DMA'd from HBM at grid step 0 into a
persistent scratch buffer — the TPU grid is sequential, so the scratch
outlives grid steps and avoids Pallas' input double-buffering) and fuses,
per ROI:
  1. interpolation-matrix construction (VPU)
  2. the H-contraction  (PH, H) @ (H, W*C)        (MXU)
  3. the W-contraction  (PW, W) @ (W, C) per row  (MXU)
so the intermediate never touches HBM.

Backward is the XLA separable-matmul formulation via custom_vjp (runs once
per step; the VMEM-residency win matters most on the forward, which also
re-runs under rematerialization). ROIs carry no gradient (torchvision
semantics).

VMEM budget (C4 res4, 50x84x1024 bf16): ~8.6M map scratch + ~4.8M fp32 mid.
Falls back to interpret mode on CPU for tests.

Measured on v5e (512 ROIs, 50x84x1024 bf16, fwd compute only): XLA
formulation 5.6 ms, this kernel 9.7 ms — XLA batches ALL ROIs into one
(R*PH, H) @ (H, W*C) MXU matmul while the per-ROI grid here issues 14-row
matmuls (~11% MXU row occupancy). The XLA path (ops/roi_align.py) therefore
remains the default; this kernel is kept as the zero-HBM-intermediate
alternative (useful under memory pressure) and as the Pallas reference for
the op. Forward is bit-exact vs the XLA path on TPU.
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
    shape = (pooled, sampling, dim)
    # Mosaic's tpu.iota is integer-only; cast after
    ph = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    s = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    grid = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    coords = start + (ph + (s + 0.5) / sampling) * bin_size  # (P, S, dim)
    in_range = (coords > -1.0) & (coords < dim)
    cc = jnp.clip(coords, 0.0, dim - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid)) * in_range.astype(jnp.float32)
    return jnp.mean(w, axis=1)  # (P, dim)


def _roi_coords(rois_ref, r, scale):
    x1 = rois_ref[r, 0] * scale - 0.5
    y1 = rois_ref[r, 1] * scale - 0.5
    x2 = rois_ref[r, 2] * scale - 0.5
    y2 = rois_ref[r, 3] * scale - 0.5
    return x1, y1, x2, y2


def _fwd_kernel(rois_ref, f_hbm, out_ref, f_vmem, sem, *, ph, pw, sampling, scale, H, W, C):
    """f_hbm/f_vmem are pre-reshaped (H, W*C) — reshaping inside the kernel
    would merge tile-padded dims, which Mosaic cannot relayout."""
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _load():
        cp = pltpu.make_async_copy(f_hbm, f_vmem, sem)
        cp.start()
        cp.wait()

    x1, y1, x2, y2 = _roi_coords(rois_ref, r, scale)
    wy = _weights(y1, y2 - y1, ph, sampling, H)  # (PH, H) fp32
    wx = _weights(x1, x2 - x1, pw, sampling, W)  # (PW, W) fp32

    f2d = f_vmem[:]
    mid = jnp.dot(wy.astype(f2d.dtype), f2d, preferred_element_type=jnp.float32)  # (PH, W*C)
    for p in range(ph):  # PH small static loop; each is an MXU matmul
        out_ref[0, p] = jnp.dot(
            wx, mid[p].reshape(W, C), preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas(features, rois, output_size=(14, 14), spatial_scale=1.0 / 16, sampling_ratio=2, interpret=False):
    """features (H, W, C), rois (R, 4) -> (R, PH, PW, C). aligned=True
    semantics identical to ops/roi_align.roi_align."""
    return _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret)


def _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret):
    H, W, C = features.shape
    R = rois.shape[0]
    ph, pw = output_size
    s = max(sampling_ratio, 1) if sampling_ratio else 2
    kernel = functools.partial(_fwd_kernel, ph=ph, pw=pw, sampling=s, scale=spatial_scale, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; DMA'd once
        ],
        out_specs=pl.BlockSpec((1, ph, pw, C), lambda r: (r, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), features.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, W * C), features.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rois.astype(jnp.float32), features.reshape(H, W * C))


def _fwd_rule(features, rois, output_size, spatial_scale, sampling_ratio, interpret):
    out = _fwd(features, rois, output_size, spatial_scale, sampling_ratio, interpret)
    return out, (features, rois)


def _bwd_rule(output_size, spatial_scale, sampling_ratio, interpret, res, g):
    """Backward via the XLA separable-matmul formulation (proven; runs once
    per step — the fused VMEM residency matters most on the forward, which
    also runs under rematerialization recompute)."""
    from ..roi_align import _interp_matrix

    features, rois = res
    H, W, C = features.shape
    ph, pw = output_size
    s = max(sampling_ratio, 1) if sampling_ratio else 2

    b = rois.astype(jnp.float32) * spatial_scale - 0.5
    wy = _interp_matrix(b[:, 1], b[:, 3] - b[:, 1], ph, s, H)  # (R, PH, H)
    wx = _interp_matrix(b[:, 0], b[:, 2] - b[:, 0], pw, s, W)  # (R, PW, W)
    g32 = g.astype(jnp.float32)
    # tmp[r, p, w, c] = sum_q wx[r, q, w] g[r, p, q, c]
    tmp = jnp.einsum("rqw,rpqc->rpwc", wx, g32, preferred_element_type=jnp.float32)
    # df[h, w, c] = sum_r sum_p wy[r, p, h] tmp[r, p, w, c]
    df = jnp.einsum("rph,rpwc->hwc", wy, tmp, preferred_element_type=jnp.float32)
    return df.astype(features.dtype), None  # no gradient w.r.t. rois


roi_align_pallas.defvjp(_fwd_rule, _bwd_rule)
