"""RoIAlign, TPU-native.

Replaces torchvision's CUDA `roi_align` (reference detectron2/layers/
roi_align.py:7-47, aligned=True "ROIAlignV2" semantics) with an MXU-friendly
reformulation: bilinear sampling is separable, so RoIAlign is two small dense
matmuls per ROI against per-ROI 1-D interpolation matrices:

    out[r, ph, pw, c] = sum_w Wx[r, pw, w] * sum_h Wy[r, ph, h] * F[h, w, c]

where Wy[r, ph, h] already folds in the average over the `sampling_ratio`
sample points of each bin. No gathers, no scatter — everything rides the MXU
as (R*PH, H) @ (H, W*C) style contractions, which XLA tiles natively.

A naive gather-based implementation (`roi_align_gather`) is kept as the
test oracle.

Note on sampling_ratio=0: the reference computes an adaptive per-ROI sample
count (ceil(bin_size)); that is a dynamic shape, so here 0 maps to a static
default of 2 samples per bin axis (standard detectron2 FPN setting; AP impact
is negligible for C4 at res4 stride 16).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _interp_matrix(
    start: jnp.ndarray,  # (R,) roi start coordinate (already scaled, aligned)
    size: jnp.ndarray,  # (R,) roi extent in feature coords
    pooled: int,
    sampling: int,
    dim: int,
) -> jnp.ndarray:
    """Build (R, pooled, dim) averaged bilinear interpolation matrices."""
    bin_size = size / pooled  # (R,)
    # sample offsets within a bin: (ph + (s + .5)/S) * bin
    ph = jnp.arange(pooled, dtype=start.dtype)  # (P,)
    s = (jnp.arange(sampling, dtype=start.dtype) + 0.5) / sampling  # (S,)
    # coords: (R, P, S)
    coords = start[:, None, None] + (ph[None, :, None] + s[None, None, :]) * bin_size[:, None, None]
    # torchvision bilinear_interpolate boundary handling:
    in_range = (coords > -1.0) & (coords < dim)
    cc = jnp.clip(coords, 0.0, dim - 1)
    grid = jnp.arange(dim, dtype=start.dtype)  # (dim,)
    # triangular weights: (R, P, S, dim)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - grid))
    w = w * in_range[..., None].astype(w.dtype)
    return jnp.mean(w, axis=2)  # fold sample-averaging: (R, P, dim)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "sampling_ratio", "aligned", "chunk_size"),
)
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: Tuple[int, int] = (14, 14),
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 0,
    aligned: bool = True,
    chunk_size: int = 128,
) -> jnp.ndarray:
    """MXU-native RoIAlign.

    Args:
      features: (H, W, C).
      boxes: (R, 4) XYXY in image coordinates.
      output_size: (PH, PW).
      spatial_scale: feature stride reciprocal.
      sampling_ratio: samples per bin axis; 0 -> 2 (see module docstring).
    Returns:
      (R, PH, PW, C) pooled features. Rows for degenerate/padded boxes are
      whatever the all-zero box samples at the map corner — callers mask.
    """
    H, W, C = features.shape
    R = boxes.shape[0]
    PH, PW = output_size
    S = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    b = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    if not aligned:  # legacy ROIAlign forces malformed ROIs to be 1px
        w_roi = jnp.maximum(x2 - x1, 1.0)
        h_roi = jnp.maximum(y2 - y1, 1.0)
    else:
        w_roi = x2 - x1
        h_roi = y2 - y1

    # contraction order: interpolate the axis that leaves the SMALLER
    # (HBM-resident, layout-copied) intermediate first — x-first gives
    # (r, H, PW, C) cells = H*PW vs y-first's PH*W; for C4 maps (H≈50, W≈84,
    # P=14) x-first is ~40% smaller and the intermediate's reshape/layout
    # traffic dominates the pool cost (xprof, docs/PERF.md round 2)
    x_first = H * PW < PH * W
    if x_first:
        f2d = jnp.transpose(features, (1, 0, 2)).reshape(W, H * C)  # tiny map transpose
    else:
        f2d = features.reshape(H, W * C)

    def pool_chunk(args):
        y1c, h_c, x1c, w_c = args
        r = y1c.shape[0]
        wy = _interp_matrix(y1c, h_c, PH, S, H)  # (r, PH, H)
        wx = _interp_matrix(x1c, w_c, PW, S, W)  # (r, PW, W)
        # fp32 inputs get exact-precision matmuls (interpolation weights are
        # exact values, and eval parity cares); bf16 inputs ride the MXU
        # natively at full speed.
        precision = (
            jax.lax.Precision.HIGHEST if features.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
        )
        if x_first:
            # (r*PW, W) @ (W, H*C) -> (r, PW, H, C)
            mid = jnp.matmul(
                wx.reshape(r * PW, W).astype(features.dtype), f2d, precision=precision
            ).reshape(r, PW, H, C)
            # contract H: (r, PH, H) x (r, PW, H, C) -> (r, PH, PW, C)
            out = jnp.einsum(
                "rph,rqhc->rpqc",
                wy.astype(features.dtype),
                mid,
                precision=precision,
                preferred_element_type=jnp.float32,
            )
        else:
            # (r*PH, H) @ (H, W*C) -> (r, PH, W, C)
            mid = jnp.matmul(
                wy.reshape(r * PH, H).astype(features.dtype), f2d, precision=precision
            ).reshape(r, PH, W, C)
            # contract W: (r, PW, W) x (r, PH, W, C) -> (r, PH, PW, C)
            out = jnp.einsum(
                "rqw,rpwc->rpqc",
                wx.astype(features.dtype),
                mid,
                precision=precision,
                preferred_element_type=jnp.float32,
            )
        return out.astype(features.dtype)

    if R <= chunk_size:
        return pool_chunk((y1, h_roi, x1, w_roi))

    pad = (-R) % chunk_size
    y1p = jnp.pad(y1, (0, pad))
    hp = jnp.pad(h_roi, (0, pad))
    x1p = jnp.pad(x1, (0, pad))
    wp = jnp.pad(w_roi, (0, pad))
    n_chunks = (R + pad) // chunk_size
    reshape = lambda v: v.reshape(n_chunks, chunk_size)
    out = jax.lax.map(pool_chunk, (reshape(y1p), reshape(hp), reshape(x1p), reshape(wp)))
    return out.reshape(n_chunks * chunk_size, PH, PW, C)[:R]


def roi_align_gather(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: Tuple[int, int] = (14, 14),
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """Reference gather-based implementation (test oracle for `roi_align`)."""
    H, W, C = features.shape
    PH, PW = output_size
    S = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    def one_roi(box):
        b = box.astype(jnp.float32) * spatial_scale - offset
        x1, y1, x2, y2 = b[0], b[1], b[2], b[3]
        if not aligned:
            w_roi = jnp.maximum(x2 - x1, 1.0)
            h_roi = jnp.maximum(y2 - y1, 1.0)
        else:
            w_roi, h_roi = x2 - x1, y2 - y1
        bin_h, bin_w = h_roi / PH, w_roi / PW
        sy = (jnp.arange(S) + 0.5) / S
        ys = y1 + (jnp.arange(PH)[:, None] + sy[None, :]) * bin_h  # (PH, S)
        xs = x1 + (jnp.arange(PW)[:, None] + sy[None, :]) * bin_w  # (PW, S)

        # vectorized bilinear over all (PH, PW, S, S) sample points at once
        yy = jnp.broadcast_to(ys[:, None, :, None], (PH, PW, S, S))
        xx = jnp.broadcast_to(xs[None, :, None, :], (PH, PW, S, S))
        ok = (yy > -1.0) & (yy < H) & (xx > -1.0) & (xx < W)
        y = jnp.clip(yy, 0.0, H - 1)
        x = jnp.clip(xx, 0.0, W - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)
        ly, lx = (y - y0)[..., None], (x - x0)[..., None]
        v = (
            features[y0, x0] * (1 - ly) * (1 - lx)
            + features[y0, x1i] * (1 - ly) * lx
            + features[y1i, x0] * ly * (1 - lx)
            + features[y1i, x1i] * ly * lx
        )
        vals = v * ok[..., None].astype(features.dtype)  # (PH,PW,S,S,C)
        return jnp.mean(vals, axis=(2, 3))

    return jax.vmap(one_roi)(boxes)
