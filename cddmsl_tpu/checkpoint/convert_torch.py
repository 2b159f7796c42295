"""PyTorch checkpoint -> JAX param-tree converters.

The TPU-native equivalent of the reference's checkpoint key-mapping stack
(detectron2/checkpoint/clip_model_loading.py:190
`align_and_update_state_dicts_for_CLIP`, detection_checkpoint.py:102-110):
one-time converters from the three torch dialects into this package's flax
param trees:

  * OpenAI-CLIP / RegionCLIP visual towers ("visual.*" or "backbone.*")
    -> ModifiedResNet params
  * CLIP text towers ("transformer.resblocks.*", token/positional embedding,
    ln_final, text_projection) -> CLIPTextEncoder params
  * ClipCap mappers ("clip_project.*") -> TransformerMapper params
  * full Detectron2-format CDDMSL detectors (backbone.* +
    proposal_generator.rpn_head.* + roi_heads.box_predictor.*)
  * precomputed text-embedding classifiers (TEXT_EMB_PATH tensors)

Layout rules: torch conv OIHW -> flax HWIO (transpose 2,3,1,0); torch Linear
(out,in) -> flax Dense kernel (in,out) (transpose); BN buffers copy 1:1;
packed attention in_proj matrices stay (3C,C) because our MultiheadAttention
computes x @ W.T exactly like torch F.linear.
"""

import logging
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load -> {name: np.ndarray}; unwraps d2-style {'model': ...} and
    ClipCap-style raw state dicts."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.float().numpy() if v.dtype.is_floating_point else v.numpy()
    return out


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)  # (out,in) -> (in,out)


_BN_MAP = {"weight": "weight", "bias": "bias", "running_mean": "running_mean", "running_var": "running_var"}


def convert_clip_visual(
    sd: Dict[str, np.ndarray], src_prefix: str = "visual."
) -> Dict[str, Any]:
    """torch ModifiedResNet ('visual.*' OAI naming or 'backbone.*' d2 naming)
    -> flax ModifiedResNet param dict."""
    tree: Dict[str, Any] = {}
    pat_block = re.compile(r"^layer(\d)\.(\d+)\.(.+)$")
    for key, val in sd.items():
        if not key.startswith(src_prefix):
            continue
        k = key[len(src_prefix):]
        # stem
        m = re.match(r"^(conv[123])\.weight$", k)
        if m:
            _set(tree, (m.group(1), "kernel"), _conv(val))
            continue
        m = re.match(r"^(bn[123])\.(\w+)$", k)
        if m and m.group(2) in _BN_MAP:
            _set(tree, (m.group(1), _BN_MAP[m.group(2)]), val)
            continue
        # residual stages
        m = pat_block.match(k)
        if m:
            stage, idx, rest = m.group(1), m.group(2), m.group(3)
            blk = f"layer{stage}_{idx}"
            m2 = re.match(r"^(conv[123])\.weight$", rest)
            if m2:
                _set(tree, (blk, m2.group(1), "kernel"), _conv(val))
                continue
            m2 = re.match(r"^(bn[123])\.(\w+)$", rest)
            if m2 and m2.group(2) in _BN_MAP:
                _set(tree, (blk, m2.group(1), _BN_MAP[m2.group(2)]), val)
                continue
            # downsample: "-1"=AvgPool (no params), "0"=conv, "1"=bn
            m2 = re.match(r"^downsample\.0\.weight$", rest)
            if m2:
                _set(tree, (blk, "downsample_conv", "kernel"), _conv(val))
                continue
            m2 = re.match(r"^downsample\.1\.(\w+)$", rest)
            if m2 and m2.group(1) in _BN_MAP:
                _set(tree, (blk, "downsample_bn", _BN_MAP[m2.group(1)]), val)
                continue
            continue
        # attention pool
        m = re.match(r"^attnpool\.positional_embedding$", k)
        if m:
            _set(tree, ("attnpool", "positional_embedding"), val)
            continue
        m = re.match(r"^attnpool\.([qkvc]_proj)\.(weight|bias)$", k)
        if m:
            name, kind = m.group(1), m.group(2)
            if kind == "weight":
                _set(tree, ("attnpool", name, "kernel"), _dense(val))
            else:
                _set(tree, ("attnpool", name, "bias"), val)
            continue
    return tree


def convert_clip_text(sd: Dict[str, np.ndarray], src_prefix: str = "") -> Dict[str, Any]:
    """torch CLIP text tower -> flax CLIPTextEncoder params."""
    tree: Dict[str, Any] = {}
    p = src_prefix
    for key, val in sd.items():
        if not key.startswith(p):
            continue
        k = key[len(p):]
        if k == "token_embedding.weight":
            _set(tree, ("token_embedding",), val)
        elif k == "positional_embedding":
            _set(tree, ("positional_embedding",), val)
        elif k == "text_projection":
            _set(tree, ("text_projection",), val)
        elif k.startswith("ln_final."):
            _set(tree, ("ln_final", "scale" if k.endswith("weight") else "bias"), val)
        else:
            m = re.match(r"^transformer\.resblocks\.(\d+)\.(.+)$", k)
            if not m:
                continue
            blk, rest = f"resblocks_{m.group(1)}", m.group(2)
            if rest == "attn.in_proj_weight":
                _set(tree, (blk, "attn", "in_proj_weight"), val)
            elif rest == "attn.in_proj_bias":
                _set(tree, (blk, "attn", "in_proj_bias"), val)
            elif rest == "attn.out_proj.weight":
                _set(tree, (blk, "attn", "out_proj", "kernel"), _dense(val))
            elif rest == "attn.out_proj.bias":
                _set(tree, (blk, "attn", "out_proj", "bias"), val)
            elif rest.startswith("ln_1."):
                _set(tree, (blk, "ln_1", "scale" if rest.endswith("weight") else "bias"), val)
            elif rest.startswith("ln_2."):
                _set(tree, (blk, "ln_2", "scale" if rest.endswith("weight") else "bias"), val)
            elif rest == "mlp.c_fc.weight":
                _set(tree, (blk, "mlp_c_fc", "kernel"), _dense(val))
            elif rest == "mlp.c_fc.bias":
                _set(tree, (blk, "mlp_c_fc", "bias"), val)
            elif rest == "mlp.c_proj.weight":
                _set(tree, (blk, "mlp_c_proj", "kernel"), _dense(val))
            elif rest == "mlp.c_proj.bias":
                _set(tree, (blk, "mlp_c_proj", "bias"), val)
    return tree


def convert_clipcap_mapper(
    sd: Dict[str, np.ndarray], src_prefix: str = "clip_project."
) -> Dict[str, Any]:
    """torch TransformerMapper (clipcap.py:149-163) -> flax TransformerMapper
    params. Only `clip_project` is kept, as in train_loop.py:281-288."""
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if not key.startswith(src_prefix):
            continue
        k = key[len(src_prefix):]
        if k == "linear.weight":
            _set(tree, ("linear", "kernel"), _dense(val))
        elif k == "linear.bias":
            _set(tree, ("linear", "bias"), val)
        elif k == "prefix_const":
            _set(tree, ("prefix_const",), val)
        else:
            m = re.match(r"^transformer\.layers\.(\d+)\.(.+)$", k)
            if not m:
                continue
            blk, rest = f"layers_{m.group(1)}", m.group(2)
            if rest.startswith("norm1."):
                _set(tree, (blk, "norm1", "scale" if rest.endswith("weight") else "bias"), val)
            elif rest.startswith("norm2."):
                _set(tree, (blk, "norm2", "scale" if rest.endswith("weight") else "bias"), val)
            elif rest == "attn.to_queries.weight":
                _set(tree, (blk, "attn", "to_queries", "kernel"), _dense(val))
            elif rest == "attn.to_keys_values.weight":
                _set(tree, (blk, "attn", "to_keys_values", "kernel"), _dense(val))
            elif rest == "attn.project.weight":
                _set(tree, (blk, "attn", "project", "kernel"), _dense(val))
            elif rest == "attn.project.bias":
                _set(tree, (blk, "attn", "project", "bias"), val)
            elif rest == "mlp.fc1.weight":
                _set(tree, (blk, "mlp_fc1", "kernel"), _dense(val))
            elif rest == "mlp.fc1.bias":
                _set(tree, (blk, "mlp_fc1", "bias"), val)
            elif rest == "mlp.fc2.weight":
                _set(tree, (blk, "mlp_fc2", "kernel"), _dense(val))
            elif rest == "mlp.fc2.bias":
                _set(tree, (blk, "mlp_fc2", "bias"), val)
    return tree


def convert_rpn_head(sd: Dict[str, np.ndarray], src_prefix: str = "proposal_generator.rpn_head.") -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if not key.startswith(src_prefix):
            continue
        k = key[len(src_prefix):]
        m = re.match(r"^(conv|objectness_logits|anchor_deltas)\.(weight|bias)$", k)
        if m:
            name, kind = m.group(1), m.group(2)
            if kind == "weight":
                _set(tree, ("head", name, "kernel"), _conv(val))
            else:
                _set(tree, ("head", name, "bias"), val)
    return tree


def convert_box_predictor(
    sd: Dict[str, np.ndarray],
    src_prefix: str = "roi_heads.box_predictor.",
    num_classes: Optional[int] = None,
) -> Dict[str, Any]:
    """When `num_classes` is given, applies the reference's background-row
    surgery (clip_model_loading.py:160-185) to checkpoints that carry a
    background class: cls_score with K+1 rows and bg at index 0 loses that
    row (this model's bg logit is an implicit zero embedding), and bbox_pred
    with (K+1)*4 outputs loses the first 4 (bg deltas)."""
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if not key.startswith(src_prefix):
            continue
        k = key[len(src_prefix):]
        if k == "cls_score.weight":
            if num_classes is not None and val.shape[0] == num_classes + 1:
                logger.info("bg-row surgery: cls_score %s -> dropping bg row 0", val.shape)
                val = val[1:]
            _set(tree, ("box_predictor", "cls_score_weight"), val)  # (K, D), no transpose
        elif k == "bbox_pred.weight":
            if num_classes is not None and val.shape[0] == (num_classes + 1) * 4:
                logger.info("bg-row surgery: bbox_pred %s -> dropping bg deltas", val.shape)
                val = val[4:]
            _set(tree, ("box_predictor", "bbox_pred", "kernel"), _dense(val))
        elif k == "bbox_pred.bias":
            if num_classes is not None and val.shape[0] == (num_classes + 1) * 4:
                val = val[4:]
            _set(tree, ("box_predictor", "bbox_pred", "bias"), val)
    return tree


def convert_d2_resnet(sd: Dict[str, np.ndarray], src_prefix: str = "backbone.") -> Dict[str, Any]:
    """torch d2 ResNet ('backbone.stem.conv1.*', 'backbone.res2.0.conv1.*',
    shortcut/norm naming — reference modeling/backbone/resnet.py) -> flax
    D2ResNet params (stem_conv1/stem_bn1, res{s}_{i} blocks).

    DCN blocks (DeformBottleneckBlock): the reference stores the deformable
    3x3 as 'conv2.weight' + 'conv2_offset.{weight,bias}'; ours is the raw
    param 'conv2_kernel' + the 'conv2_offset' conv module."""
    # blocks that carry an offset conv hold their 3x3 as a raw kernel param
    deform_blocks = {
        m.group(1)
        for key in sd
        if key.startswith(src_prefix)
        and (m := re.match(r"^(res\d\.\d+)\.conv2_offset\.", key[len(src_prefix):]))
    }
    tree: Dict[str, Any] = {}
    for key, val in sd.items():
        if not key.startswith(src_prefix):
            continue
        k = key[len(src_prefix):]
        m = re.match(r"^(res\d)\.(\d+)\.conv2_offset\.(weight|bias)$", k)
        if m:
            blk = f"{m.group(1)}_{m.group(2)}"
            if m.group(3) == "weight":
                _set(tree, (blk, "conv2_offset", "kernel"), _conv(val))
            else:
                _set(tree, (blk, "conv2_offset", "bias"), val)
            continue
        m = re.match(r"^(res\d)\.(\d+)\.conv2\.weight$", k)
        if m and f"{m.group(1)}.{m.group(2)}" in deform_blocks:
            _set(tree, (f"{m.group(1)}_{m.group(2)}", "conv2_kernel"), _conv(val))
            continue
        m = re.match(r"^stem\.conv1\.weight$", k)
        if m:
            _set(tree, ("stem_conv1", "kernel"), _conv(val))
            continue
        m = re.match(r"^stem\.conv1\.norm\.(\w+)$", k)
        if m and m.group(1) in _BN_MAP:
            _set(tree, ("stem_bn1", _BN_MAP[m.group(1)]), val)
            continue
        m = re.match(r"^res(\d)\.(\d+)\.(.+)$", k)
        if not m:
            continue
        blk = f"res{m.group(1)}_{m.group(2)}"
        rest = m.group(3)
        m2 = re.match(r"^(conv[123])\.weight$", rest)
        if m2:
            _set(tree, (blk, m2.group(1), "kernel"), _conv(val))
            continue
        m2 = re.match(r"^(conv[123])\.norm\.(\w+)$", rest)
        if m2 and m2.group(2) in _BN_MAP:
            _set(tree, (blk, "bn" + m2.group(1)[-1], _BN_MAP[m2.group(2)]), val)
            continue
        m2 = re.match(r"^shortcut\.weight$", rest)
        if m2:
            _set(tree, (blk, "shortcut", "kernel"), _conv(val))
            continue
        m2 = re.match(r"^shortcut\.norm\.(\w+)$", rest)
        if m2 and m2.group(1) in _BN_MAP:
            _set(tree, (blk, "shortcut_bn", _BN_MAP[m2.group(1)]), val)
            continue
    return tree


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax nn.ConvTranspose
    kernel (kh, kw, in, out). flax's ConvTranspose is the fractionally-strided
    conv withOUT the gradient-of-conv kernel flip, so the spatial taps must be
    flipped to match torch (verified numerically in
    tests/test_fpn_checkpoint.py::test_deconv_layout_parity)."""
    return w.transpose(2, 3, 0, 1)[::-1, ::-1]


def _dense_from_chw_flat(w: np.ndarray, c: int, h: int, ww: int) -> np.ndarray:
    """torch Linear weight (out, C*H*W) acting on an NCHW flatten -> flax
    Dense kernel (H*W*C, out) acting on this repo's NHWC flatten (the RoI
    pooler emits (R, P, P, C); reference box_head.fc1 sees (R, C, P, P))."""
    out = w.shape[0]
    return w.reshape(out, c, h, ww).transpose(0, 2, 3, 1).reshape(out, h * ww * c).T.copy()


def convert_d2_fpn_rcnn(
    sd: Dict[str, np.ndarray], pooler_resolution: int = 7
) -> Dict[str, Any]:
    """d2 FPN R-CNN checkpoint ('backbone.bottom_up.*' ResNet +
    'backbone.fpn_lateral{2-5}/fpn_output{2-5}' + RPN head + 2-FC box head +
    softmax cls_score (bg LAST, matching this repo's layout — no surgery) +
    optional mask head) -> FPNRCNN flax tree. Reference naming:
    detectron2/modeling/backbone/fpn.py + roi_heads/box_head.py:FastRCNNConvFCHead
    + mask_head.py:MaskRCNNConvUpsampleHead."""
    tree: Dict[str, Any] = {
        "backbone": convert_d2_resnet(sd, "backbone.bottom_up."),
        "proposal_generator": convert_rpn_head(sd),
    }
    fpn: Dict[str, Any] = {}
    for key, val in sd.items():
        m = re.match(r"^backbone\.fpn_(lateral|output)(\d)\.(weight|bias)$", key)
        if m:
            kind, lvl, part = m.groups()
            name = f"{kind}_res{lvl}"
            if part == "weight":
                _set(fpn, (name, "kernel"), _conv(val))
            else:
                _set(fpn, (name, "bias"), val)
            continue
        m = re.match(r"^backbone\.fpn_(lateral|output)(\d)\.norm\.(weight|bias)$", key)
        if m:  # GN variants (Misc/*_gn): norm scale/bias, conv has no bias
            kind, lvl, part = m.groups()
            _set(fpn, (f"{kind}_res{lvl}_gn", "scale" if part == "weight" else "bias"), val)
    if fpn:
        tree["fpn"] = fpn

    roi: Dict[str, Any] = {}
    # infer fc1's conv-shaped input (C, P, P) from the box-head conv stack
    # (last conv out-channels) or the FPN width
    fc_in_c = None
    for key in sorted(sd):
        m = re.match(r"^roi_heads\.box_head\.conv(\d)\.weight$", key)
        if m:
            fc_in_c = sd[key].shape[0]
    if fc_in_c is None and "backbone.fpn_output2.weight" in sd:
        fc_in_c = sd["backbone.fpn_output2.weight"].shape[0]
    for key, val in sd.items():
        m = re.match(r"^roi_heads\.box_head\.fc(\d)\.(weight|bias)$", key)
        if m:
            idx, part = m.groups()
            name = f"box_head_fc{idx}"
            if part == "bias":
                _set(roi, (name, "bias"), val)
            elif idx == "1" and fc_in_c and val.shape[1] == fc_in_c * pooler_resolution ** 2:
                # fc1 consumes the flattened pooled map: NCHW->NHWC reorder
                _set(roi, (name, "kernel"),
                     _dense_from_chw_flat(val, fc_in_c, pooler_resolution, pooler_resolution))
            else:
                _set(roi, (name, "kernel"), _dense(val))
            continue
        m = re.match(r"^roi_heads\.box_head\.conv(\d)\.weight$", key)
        if m:
            _set(roi, (f"box_head_conv{m.group(1)}", "kernel"), _conv(val))
            continue
        m = re.match(r"^roi_heads\.box_head\.conv(\d)\.norm\.(weight|bias)$", key)
        if m:
            _set(roi, (f"box_head_conv{m.group(1)}_gn",
                       "scale" if m.group(2) == "weight" else "bias"), val)
            continue
        m = re.match(r"^roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)$", key)
        if m:
            name, part = m.groups()
            _set(roi, ("box_predictor", name, "kernel" if part == "weight" else "bias"),
                 _dense(val) if part == "weight" else val)
            continue
        m = re.match(r"^roi_heads\.mask_head\.mask_fcn(\d)\.(weight|bias)$", key)
        if m:
            _set(roi, ("mask_head", f"mask_fcn{m.group(1)}",
                       "kernel" if m.group(2) == "weight" else "bias"),
                 _conv(val) if m.group(2) == "weight" else val)
            continue
        m = re.match(r"^roi_heads\.mask_head\.mask_fcn(\d)\.norm\.(weight|bias)$", key)
        if m:
            _set(roi, ("mask_head", f"mask_fcn{m.group(1)}_gn",
                       "scale" if m.group(2) == "weight" else "bias"), val)
            continue
        m = re.match(r"^roi_heads\.mask_head\.deconv\.(weight|bias)$", key)
        if m:
            _set(roi, ("mask_head", "deconv", "kernel" if m.group(1) == "weight" else "bias"),
                 _deconv(val) if m.group(1) == "weight" else val)
            continue
        m = re.match(r"^roi_heads\.mask_head\.predictor\.(weight|bias)$", key)
        if m:
            _set(roi, ("mask_head", "predictor", "kernel" if m.group(1) == "weight" else "bias"),
                 _conv(val) if m.group(1) == "weight" else val)
            continue
    if roi:
        tree["roi_heads"] = roi
    return tree


def convert_d2_retinanet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """d2 RetinaNet checkpoint -> RetinaNet flax tree. Reference naming
    (modeling/meta_arch/retinanet.py RetinaNetHead + backbone/fpn.py
    LastLevelP6P7): 'backbone.bottom_up.*' ResNet, 'backbone.fpn_lateral
    {3-5}/fpn_output{3-5}', 'backbone.top_block.p{6,7}', and the head's
    'head.{cls,bbox}_subnet.{0,2,4,6}' Sequential convs (odd indices are
    ReLUs) + 'head.cls_score/bbox_pred'."""
    tree: Dict[str, Any] = {"backbone": convert_d2_resnet(sd, "backbone.bottom_up.")}
    fpn: Dict[str, Any] = {}
    head: Dict[str, Any] = {}
    for key, val in sd.items():
        m = re.match(r"^backbone\.fpn_(lateral|output)(\d)\.(weight|bias)$", key)
        if m:
            kind, lvl, part = m.groups()
            _set(fpn, (f"{kind}_res{lvl}", "kernel" if part == "weight" else "bias"),
                 _conv(val) if part == "weight" else val)
            continue
        m = re.match(r"^backbone\.top_block\.p(\d)\.(weight|bias)$", key)
        if m:
            lvl, part = m.groups()
            _set(fpn, (f"top_block_p{lvl}", "kernel" if part == "weight" else "bias"),
                 _conv(val) if part == "weight" else val)
            continue
        m = re.match(r"^head\.(cls|bbox)_subnet\.(\d+)\.(weight|bias)$", key)
        if m:
            kind, idx, part = m.groups()
            # Sequential(conv, relu, conv, relu, ...) -> conv index i//2
            name = f"{'cls' if kind == 'cls' else 'box'}_conv{int(idx) // 2}"
            _set(head, (name, "kernel" if part == "weight" else "bias"),
                 _conv(val) if part == "weight" else val)
            continue
        m = re.match(r"^head\.(cls_score|bbox_pred)\.(weight|bias)$", key)
        if m:
            name, part = m.groups()
            _set(head, (name, "kernel" if part == "weight" else "bias"),
                 _conv(val) if part == "weight" else val)
            continue
    if fpn:
        tree["fpn"] = fpn
    if head:
        tree["head"] = head
    return tree


def load_bb_rpn_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Second checkpoint for the FROZEN offline backbone + RPN of
    CLIPFastRCNN (reference clip_model_loading.py:216 bb_rpn_weights branch +
    engine/defaults.py:393-399 second_checkpointer): 'backbone.*' ->
    offline_backbone, 'proposal_generator.*' -> offline_proposal_generator."""
    import jax

    sd = load_torch_state_dict(path)
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    tree = new["params"] if "params" in new else new
    assert "offline_backbone" in tree, "model has no offline_backbone (bb_rpn_weights needs CLIPFastRCNN-style arch)"
    _merge(tree["offline_backbone"], convert_d2_resnet(sd, "backbone."))
    if "offline_proposal_generator" in tree:
        _merge(tree["offline_proposal_generator"], convert_rpn_head(sd, "proposal_generator.rpn_head."))
    return new


def detect_dialect(sd: Dict[str, np.ndarray]) -> str:
    keys = sd.keys()
    if any(k.startswith("clip_project.") for k in keys):
        return "clipcap"
    if any(k.startswith("visual.") for k in keys):
        return "oai_clip"
    if any(k.startswith("head.cls_subnet.") for k in keys):
        return "d2_retinanet"
    if any(k.startswith("backbone.bottom_up.") or k.startswith("backbone.fpn_lateral") for k in keys):
        return "d2_fpn"
    if any(k.startswith("backbone.") for k in keys):
        return "d2_rcnn"
    if any(k.startswith("lang_encoder.") for k in keys):
        return "lang"
    return "unknown"


def _merge(dst: Dict, src: Dict, path=()) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v, path + (k,))
        else:
            if k in dst and hasattr(dst[k], "shape") and tuple(dst[k].shape) != tuple(v.shape):
                logger.warning("shape mismatch at %s: %s vs %s — skipped", path + (k,), dst[k].shape, v.shape)
                continue
            dst[k] = v


def load_rcnn_weights(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load a torch checkpoint into a GeneralizedRCNN param tree (returns a
    NEW tree). Handles the dialects of DetectionCheckpointer._load_model."""
    import jax

    sd = load_torch_state_dict(path)
    dialect = detect_dialect(sd)
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    tree = new["params"] if "params" in new else new

    def _num_classes():
        try:
            return int(tree["roi_heads"]["box_predictor"]["cls_score_weight"].shape[0])
        except Exception:
            return None

    if dialect == "oai_clip":
        vis = convert_clip_visual(sd, "visual.")
        _merge(tree["backbone"], vis)
        if "offline_backbone" in tree:
            _merge(tree["offline_backbone"], vis)
        # OAI-CLIP full checkpoints also carry the text tower
        if "lang_encoder" in tree and any(k.startswith("transformer.") for k in sd):
            _merge(tree["lang_encoder"], convert_clip_text(sd, ""))
    elif dialect == "d2_rcnn":
        vis = convert_clip_visual(sd, "backbone.")
        _merge(tree["backbone"], vis)
        if "offline_backbone" in tree:
            _merge(tree["offline_backbone"], vis)
        _merge(tree["proposal_generator"], convert_rpn_head(sd))
        _merge(tree["roi_heads"], convert_box_predictor(sd, num_classes=_num_classes()))
        if "lang_encoder" in tree and any(k.startswith("lang_encoder.") for k in sd):
            _merge(tree["lang_encoder"], convert_clip_text(sd, "lang_encoder."))
    elif dialect == "d2_fpn":
        # FPN-family detector checkpoints (Base-RCNN-FPN zoo); tree layout is
        # FPNRCNN's (backbone / fpn / proposal_generator / roi_heads)
        _merge(tree, convert_d2_fpn_rcnn(sd))
    elif dialect == "d2_retinanet":
        _merge(tree, convert_d2_retinanet(sd))
    elif dialect == "clipcap":
        _merge(tree["v2l_mapper"], convert_clipcap_mapper(sd))
    elif dialect == "lang":
        # RegionCLIP language-encoder checkpoints (reference
        # clip_model_loading.py 'lang_encoder.' renames)
        assert "lang_encoder" in tree, "model has no lang_encoder submodule for a lang checkpoint"
        _merge(tree["lang_encoder"], convert_clip_text(sd, "lang_encoder."))
    else:
        raise ValueError(f"Cannot detect checkpoint dialect of {path}")
    return new


def load_offline_backbone(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Force-load the frozen offline (RegionCLIP) backbone from
    MODEL.PRE_TRAINED_RCLIP_PATH, stripping the 'backbone.' prefix — the
    reference does this at train start (train_loop.py:150-164)."""
    import jax

    sd = load_torch_state_dict(path)
    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else "visual."
    vis = convert_clip_visual(sd, prefix)
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    tree = new["params"] if "params" in new else new
    _merge(tree["offline_backbone"], vis)
    return new


def load_clipcap_mapper(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load the frozen ClipCap mapper from MODEL.VISION_TO_LANG_PATH
    (reference train_loop.py:281-288: only .clip_project is kept)."""
    import jax

    sd = load_torch_state_dict(path)
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    tree = new["params"] if "params" in new else new
    _merge(tree["v2l_mapper"], convert_clipcap_mapper(sd))
    return new


def load_text_emb_classifier(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Load MODEL.CLIP.TEXT_EMB_PATH into the frozen classifier rows
    (reference fast_rcnn.py:448-452)."""
    import jax
    import torch

    w = torch.load(path, map_location="cpu", weights_only=False)
    w = w.float().numpy() if hasattr(w, "numpy") else np.asarray(w, np.float32)
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    tree = new["params"] if "params" in new else new
    cur = tree["roi_heads"]["box_predictor"]["cls_score_weight"]
    if w.shape != cur.shape:
        logger.warning("text emb shape %s != classifier %s", w.shape, cur.shape)
    tree["roi_heads"]["box_predictor"]["cls_score_weight"] = w.astype(np.float32)
    return new
