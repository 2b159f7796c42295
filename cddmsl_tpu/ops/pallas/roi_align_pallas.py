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


# ---------------------------------------------------------------------------
# v2: ROI-blocked kernel (round 2). The round-1 kernel above issues one
# 14-row MXU matmul per ROI (~11% row occupancy) and loses to the XLA
# separable-matmul form. This version processes RB ROIs per grid step:
#   * the shared-feature contraction is ONE (RB*PW, W) @ (W, H*C) GEMM
#     against a VMEM-resident transposed feature map (x-first: H*PW < PH*W
#     keeps the per-step intermediate small)
#   * the per-ROI second contraction is a 3D dot_general
#     (PH, H) x (PW, H, C) -> (PH, PW, C) — which Mosaic lowers natively —
#     so nothing is ever materialized in HBM between the two contractions.
# Backward accumulates dF in a VMEM fp32 scratch per C-tile (grid ordered
# C-outer / ROI-inner, output written once per C-tile).
#
# Measured on v5e (batch 8 x 512 ROIs, 50x84x1024 bf16, fwd+bwd): this
# kernel 234 ms vs the XLA separable-matmul path 118 ms — the XLA pipeline's
# software-pipelined GEMMs beat the kernel's per-step overhead (1024 grid
# steps x 4+1 dots each) despite its HBM intermediate. Larger ROI blocks
# (rb=16) crash the Mosaic compile helper on this toolchain. The XLA path
# stays the default; this kernel remains the zero-HBM-intermediate
# formulation (and the Pallas reference) — exact vs the oracle in interpret
# mode, ~1e-3 relative on TPU (MXU default precision).
# ---------------------------------------------------------------------------


def _weights_t(start, size, pooled: int, sampling: int, dim: int):
    """Transposed interpolation matrix (dim, pooled) built directly on the
    VPU (same math as _weights with the iota roles swapped)."""
    bin_size = size / pooled
    shape = (dim, sampling, pooled)
    grid = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    s = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    coords = start + (p + (s + 0.5) / sampling) * bin_size
    in_range = (coords > -1.0) & (coords < dim)
    cc = jnp.clip(coords, 0.0, dim - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid)) * in_range.astype(jnp.float32)
    return jnp.mean(w, axis=1)  # (dim, pooled)


def _fwd_kernel_v2(rois_ref, ft_ref, out_ref, *, rb, ph, pw, sampling, scale, H, W, C_T):
    """ft block (W, H, C_T) of the transposed feature map; out block
    (RB, PH, PW, C_T). Grid (n_c, n_rb), C outer — Pallas re-fetches the ft
    block only when the C index changes."""
    rb_step = pl.program_id(1)

    # stacked x-interp rows for the whole block: (RB*PW, W)
    wx_rows = []
    wys = []
    for i in range(rb):
        r = rb_step * rb + i
        x1, y1, x2, y2 = _roi_coords(rois_ref, r, scale)
        wx_rows.append(_weights(x1, x2 - x1, pw, sampling, W))  # (PW, W)
        wys.append(_weights(y1, y2 - y1, ph, sampling, H))  # (PH, H)
    wx_blk = jnp.concatenate(wx_rows, axis=0)  # (RB*PW, W)

    ft = ft_ref[:].reshape(W, H * C_T)
    mid = jnp.dot(wx_blk.astype(ft.dtype), ft, preferred_element_type=jnp.float32)
    mid = mid.astype(ft.dtype)  # (RB*PW, H*C_T); MXU already accumulated fp32
    for i in range(rb):
        mid_i = mid[i * pw : (i + 1) * pw].reshape(pw, H, C_T)
        out_i = jax.lax.dot_general(
            wys[i].astype(ft.dtype), mid_i,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PH, PW, C_T)
        out_ref[i] = out_i.astype(out_ref.dtype)


def _bwd_kernel_v2(rois_ref, g_ref, df_ref, acc, *, rb, n_rb, ph, pw, sampling, scale, H, W, C_T):
    """grid (n_c, n_rb) — C outer, ROI inner. g block (RB, PH, PW, C_T);
    df block (H, W, C_T) written at the last ROI step from the fp32 scratch."""
    rb_step = pl.program_id(1)

    @pl.when(rb_step == 0)
    def _zero():
        acc[:] = jnp.zeros_like(acc)

    def body(i, _):
        # sequential per-ROI accumulation: a fori_loop (vs an unrolled python
        # loop) lets Mosaic reuse one stack buffer for the per-ROI temps
        r = rb_step * rb + i
        x1 = rois_ref[r, 0] * scale - 0.5
        y1 = rois_ref[r, 1] * scale - 0.5
        x2 = rois_ref[r, 2] * scale - 0.5
        y2 = rois_ref[r, 3] * scale - 0.5
        wx = _weights(x1, x2 - x1, pw, sampling, W)  # (PW, W)
        wy_t = _weights_t(y1, y2 - y1, ph, sampling, H)  # (H, PH)
        g_i = g_ref[i]  # (PH, PW, C_T)
        # t[w, p, c] = sum_q wx[q, w] g[p, q, c]
        t_i = jax.lax.dot_general(
            wx.astype(g_i.dtype), g_i,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, PH, C_T)
        # contrib[h, w, c] = sum_p wy_t[h, p] t[w, p, c]
        contrib = jax.lax.dot_general(
            wy_t.astype(jnp.float32), t_i,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, W, C_T)
        acc[:] += contrib
        return 0

    jax.lax.fori_loop(0, rb, body, 0)

    @pl.when(rb_step == n_rb - 1)
    def _flush():
        df_ref[:] = acc[:].astype(df_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_pallas_v2(
    features, rois, output_size=(14, 14), spatial_scale=1.0 / 16,
    sampling_ratio=2, roi_block=4, interpret=False,
):
    """Blocked Pallas RoIAlign: features (H, W, C), rois (R, 4) ->
    (R, PH, PW, C). R must be a multiple of roi_block (pad with zero boxes).
    aligned=True semantics identical to ops/roi_align.roi_align."""
    return _fwd_v2(features, rois, output_size, spatial_scale, sampling_ratio, roi_block, interpret)


def _fwd_v2(features, rois, output_size, spatial_scale, sampling_ratio, roi_block, interpret):
    H, W, C = features.shape
    R = rois.shape[0]
    ph, pw = output_size
    s = max(sampling_ratio, 1) if sampling_ratio else 2
    rb = roi_block
    assert R % rb == 0, (R, rb)
    c_t = min(C, 256)
    assert C % c_t == 0
    ft = jnp.transpose(features, (1, 0, 2))  # (W, H, C), tiny one-time copy
    kernel = functools.partial(
        _fwd_kernel_v2, rb=rb, ph=ph, pw=pw, sampling=s, scale=spatial_scale, H=H, W=W, C_T=c_t
    )
    return pl.pallas_call(
        kernel,
        grid=(C // c_t, R // rb),  # C outer: ft block reused across ROI steps
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((W, H, c_t), lambda c, i: (0, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, ph, pw, c_t), lambda c, i: (i, 0, 0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, ph, pw, C), features.dtype),
        interpret=interpret,
    )(rois.astype(jnp.float32), ft)


def _fwd_rule_v2(features, rois, output_size, spatial_scale, sampling_ratio, roi_block, interpret):
    out = _fwd_v2(features, rois, output_size, spatial_scale, sampling_ratio, roi_block, interpret)
    # shape/dtype carrier (residuals must be JAX types): (H, W, 1) of f dtype
    return out, (jnp.zeros(features.shape[:2] + (1,), features.dtype), rois)


def _bwd_rule_v2(output_size, spatial_scale, sampling_ratio, roi_block, interpret, res, g):
    shape_carrier, rois = res
    H, W = shape_carrier.shape[:2]
    f_dtype = shape_carrier.dtype
    C = g.shape[-1]
    R = rois.shape[0]
    ph, pw = output_size
    s = max(sampling_ratio, 1) if sampling_ratio else 2
    rb = roi_block
    c_t = min(C, 128)
    assert C % c_t == 0
    kernel = functools.partial(
        _bwd_kernel_v2, rb=rb, n_rb=R // rb, ph=ph, pw=pw, sampling=s,
        scale=spatial_scale, H=H, W=W, C_T=c_t,
    )
    df = pl.pallas_call(
        kernel,
        grid=(C // c_t, R // rb),  # C outer so the df block is revisited
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, ph, pw, c_t), lambda c, i: (i, 0, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, c_t), lambda c, i: (0, 0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C), f_dtype),
        scratch_shapes=[pltpu.VMEM((H, W, c_t), jnp.float32)],
        interpret=interpret,
    )(rois.astype(jnp.float32), g)
    return df, None


roi_align_pallas_v2.defvjp(_fwd_rule_v2, _bwd_rule_v2)
