"""Post-training int8 quantization of the res5 (layer4) RoI stage.

The C4 eval hot path is res5-on-crops (docs/PERF.md: ~70 ms of the 163 ms
batch-4 step runs the layer4 bottlenecks on ~4000 pooled 14x14 crops). On
TPU v5e the MXU runs s8 x s8 -> s32 convolutions at ~1.8x the bf16 rate in
isolation (measured: 263 vs 148 TFLOP/s at these shapes), which motivated
this path; the END-TO-END A/B on the real eval step measured **0.976x**
(165.7 vs 161.7 ms/batch-4 — quantize/dequantize + int8 conv layout
overheads at 14x14 crop shapes eat the MXU-rate win), so TPU.QUANT_EVAL
stays OFF by default (docs/PERF.md round-3 A/B table). The subsystem is
kept as a correct, tested serving option with no reference counterpart
(the reference serves fp32/amp via torchscript; detectron2 has no
quantized inference).

Scheme (standard symmetric PTQ):
  * FrozenBN affines are folded into the conv kernels first (per-output-
    channel scale + bias) — reference FrozenBatchNorm2d semantics preserved
    exactly (models/backbone/clip_resnet.py FrozenBatchNorm).
  * weights: per-output-channel symmetric int8 (absmax / 127)
  * activations: per-tensor symmetric int8, scales from absmax calibration
    over representative eval batches (`calibrate_res5` on pooled crops)
  * conv accumulates in int32 on the MXU (preferred_element_type), dequant
    is a fused per-channel multiply; residual add + relu stay bf16.

Pure-jax functional module: consumes the backbone's `layer4_*` param
subtree directly (no flax module changes); the quantized forward is
injected at the meta-arch's `res5_fn` seam (models/rcnn.py inference).
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")
_CONV_SITES = ("conv1", "conv2", "conv3", "downsample_conv")
# activation-scale sites per block: conv1/downsample share the block input
_ACT_SITES = ("in", "conv2_in", "conv3_in", "ds_in")


def _fold_bn(kernel: jnp.ndarray, bn: Dict[str, jnp.ndarray], eps: float = 1e-5):
    """FrozenBN(conv(x)) == conv'(x) + bias' with per-out-channel folding."""
    scale = bn["weight"] * jax.lax.rsqrt(bn["running_var"] + eps)
    shift = bn["bias"] - bn["running_mean"] * scale
    return kernel.astype(jnp.float32) * scale[None, None, None, :], shift.astype(jnp.float32)


def res5_blocks(backbone_params: Dict[str, Any]) -> List[str]:
    names = sorted(
        (k for k in backbone_params if k.startswith("layer4_")),
        key=lambda s: int(s.split("_")[1]),
    )
    if not names:
        raise ValueError("backbone params carry no layer4_* blocks (not a C4 CLIP ResNet)")
    return names


def fold_res5(backbone_params: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Per-block folded fp weights: {site: (kernel_f32, bias_f32)}."""
    out = []
    for name in res5_blocks(backbone_params):
        b = backbone_params[name]
        fb = {
            "conv1": _fold_bn(b["conv1"]["kernel"], b["bn1"]),
            "conv2": _fold_bn(b["conv2"]["kernel"], b["bn2"]),
            "conv3": _fold_bn(b["conv3"]["kernel"], b["bn3"]),
        }
        if "downsample_conv" in b:
            fb["downsample_conv"] = _fold_bn(b["downsample_conv"]["kernel"], b["downsample_bn"])
        out.append(fb)
    return out


def quantize_res5(
    backbone_params: Dict[str, Any], sites: Tuple[str, ...] = _CONV_SITES
) -> List[Dict[str, Any]]:
    """Fold BN, then per-output-channel symmetric int8 weights.

    Returns per-block {site: {'w_q': int8, 'w_scale': f32 (co,), 'bias': f32}};
    sites NOT in `sites` stay BN-folded fp tuples (mixed-precision blocks —
    e.g. sites=('conv2',) quantizes only the FLOP-dominant 3x3s)."""
    qblocks = []
    for fb in fold_res5(backbone_params):
        qb = {}
        for site, (kernel, bias) in fb.items():
            if site not in sites:
                qb[site] = (kernel, bias)
                continue
            absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))  # per out-channel
            w_scale = jnp.maximum(absmax, 1e-12) / 127.0
            w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
            qb[site] = {"w_q": w_q, "w_scale": w_scale, "bias": bias}
        qblocks.append(qb)
    return qblocks


def _avg_pool(x, stride: int):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, stride, stride, 1), (1, stride, stride, 1), "VALID"
    ) / (stride * stride)


def _conv_fp(x, kernel, bias, padding):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel, (1, 1), padding,
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, kernel.shape, _DN),
    )
    return y + bias


def _conv_q(x, qsite, a_scale, padding):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, qsite["w_q"], (1, 1), padding,
        dimension_numbers=jax.lax.conv_dimension_numbers(x.shape, qsite["w_q"].shape, _DN),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (a_scale * qsite["w_scale"]) + qsite["bias"]


def _block_forward(x, block, strides, a_scales=None, absmax=None):
    """One bottleneck. `block` is folded-fp ({site: (k, b)}) when a_scales is
    None (calibration: absmax dict is filled in), else quantized
    ({site: {w_q, w_scale, bias}})."""

    def conv(inp, site, padding, scale_key):
        if a_scales is None:
            absmax[scale_key] = jnp.maximum(
                absmax.get(scale_key, jnp.zeros(())), jnp.max(jnp.abs(inp)).astype(jnp.float32)
            )
            k, b = block[site]
            return _conv_fp(inp, k, b, padding)
        if isinstance(block[site], tuple):  # mixed-precision: fp site
            k, b = block[site]
            return _conv_fp(inp, k, b, padding)
        return _conv_q(inp, block[site], a_scales[scale_key], padding)

    out = jax.nn.relu(conv(x, "conv1", "VALID", "in"))
    out = jax.nn.relu(conv(out, "conv2", ((1, 1), (1, 1)), "conv2_in"))
    if strides > 1:
        out = _avg_pool(out, strides)
    out = conv(out, "conv3", "VALID", "conv3_in")

    identity = x.astype(jnp.float32)
    if "downsample_conv" in block:
        if strides > 1:
            identity = _avg_pool(identity, strides)
        identity = conv(identity, "downsample_conv", "VALID", "ds_in")
    return jax.nn.relu(out + identity)


def _strides_for(i: int) -> int:
    # layer4_0 is the stride-2 transition block (14^2 crops -> 7^2), the
    # rest are identity-stride (clip_resnet.py ModifiedResNet.setup)
    return 2 if i == 0 else 1


def res5_forward_fp_folded(folded: List[Dict], x: jnp.ndarray) -> jnp.ndarray:
    """BN-folded fp32 res5 — the numerics oracle for fold correctness."""
    for i, block in enumerate(folded):
        x = _block_forward(x, block, _strides_for(i), a_scales=None, absmax={})
    return x


def calibrate_res5(backbone_params: Dict[str, Any], crops: jnp.ndarray) -> List[Dict[str, jnp.ndarray]]:
    """One calibration pass: fp forward on pooled crops, per-site absmax.
    Combine multiple batches with `merge_absmax`; convert with
    `scales_from_absmax`. jit-able."""
    folded = fold_res5(backbone_params)
    records = []
    x = crops
    for i, block in enumerate(folded):
        absmax: Dict[str, jnp.ndarray] = {}
        x = _block_forward(x, block, _strides_for(i), a_scales=None, absmax=absmax)
        records.append(absmax)
    return records


def merge_absmax(a: Optional[List[Dict]], b: List[Dict]) -> List[Dict]:
    if a is None:
        return b
    return [
        {k: jnp.maximum(da[k], db[k]) for k in da} for da, db in zip(a, b)
    ]


def scales_from_absmax(absmax: List[Dict]) -> List[Dict]:
    return [
        {k: jnp.maximum(v, 1e-12) / 127.0 for k, v in d.items()} for d in absmax
    ]


def res5_forward_int8(
    qblocks: List[Dict[str, Any]], act_scales: List[Dict[str, jnp.ndarray]], x: jnp.ndarray
) -> jnp.ndarray:
    """The quantized drop-in for ModifiedResNet.res5_forward: inject as the
    meta-arch's res5_fn (models/rcnn.py inference(quant_res5=...))."""
    dtype = x.dtype
    for i, (qb, sc) in enumerate(zip(qblocks, act_scales)):
        x = _block_forward(x, qb, _strides_for(i), a_scales=sc)
    return x.astype(dtype)


def prepare_quant_res5(
    backbone_params: Dict[str, Any],
    calib_crops: List[jnp.ndarray],
    sites: Tuple[str, ...] = _CONV_SITES,
) -> Tuple[List[Dict], List[Dict]]:
    """Convenience: quantize weights + calibrate activations in one call.
    `calib_crops`: list of (N, P, P, C4) pooled-crop batches."""
    calib = jax.jit(lambda c: calibrate_res5(backbone_params, c))
    absmax = None
    for crops in calib_crops:
        absmax = merge_absmax(absmax, jax.device_get(calib(crops)))
    return quantize_res5(backbone_params, sites=sites), scales_from_absmax(absmax)
