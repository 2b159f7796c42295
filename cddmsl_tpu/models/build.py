"""Model builders + registries (reference: detectron2/modeling/meta_arch/
build.py:25 build_model, META_ARCH_REGISTRY)."""

from typing import Any

import jax.numpy as jnp

from ..utils.registry import Registry
from .backbone.clip_resnet import RESNET_SPECS, EMBED_DIMS, IMAGE_RESOLUTIONS
from .rcnn import GeneralizedRCNN

META_ARCH_REGISTRY = Registry("META_ARCH")
BACKBONE_REGISTRY = Registry("BACKBONE")
ROI_HEADS_REGISTRY = Registry("ROI_HEADS")


def _dtype(cfg):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


def D2ResNet_layers(depth: int):
    from .backbone.resnet import D2_RESNET_SPECS

    return list(D2_RESNET_SPECS[depth])


@META_ARCH_REGISTRY.register()
def build_generalized_rcnn(cfg) -> GeneralizedRCNN:
    depth = cfg.MODEL.RESNETS.DEPTH
    # reference: BACKBONE.NAME selects the tower (build_resnet_backbone for
    # the plain Faster R-CNN baseline, build_clip_resnet_backbone otherwise)
    backbone_type = (
        "d2_resnet"
        if "resnet_backbone" in cfg.MODEL.BACKBONE.NAME and "clip" not in cfg.MODEL.BACKBONE.NAME
        else "clip"
    )
    if backbone_type == "d2_resnet":
        layers, width = D2ResNet_layers(depth), 64
        embed_dim = cfg.TPU.EMBED_DIM or 2048  # res5 channels, mean-pooled
        input_resolution = 224
    else:
        layers, width = RESNET_SPECS[depth]
        embed_dim = cfg.TPU.EMBED_DIM or EMBED_DIMS[depth]
        input_resolution = IMAGE_RESOLUTIONS[depth]
    # compile-light overrides (tests / CPU multichip dryrun)
    if list(cfg.TPU.BACKBONE_LAYERS):
        layers = list(cfg.TPU.BACKBONE_LAYERS)
    if cfg.TPU.BACKBONE_WIDTH:
        width = cfg.TPU.BACKBONE_WIDTH
    focal = cfg.MODEL.CLIP.FOCAL_SCALED_LOSS
    bgw = cfg.MODEL.CLIP.BG_CLS_LOSS_WEIGHT
    return GeneralizedRCNN(
        backbone_type=backbone_type,
        backbone_depth=depth,
        with_offline_backbone=(backbone_type == "clip"),
        backbone_layers=tuple(layers),
        backbone_width=width,
        backbone_out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        embed_dim=embed_dim,
        input_resolution=input_resolution,
        anchor_sizes=tuple(s for group in cfg.MODEL.ANCHOR_GENERATOR.SIZES for s in (group if isinstance(group, (list, tuple)) else [group])),
        anchor_aspect_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        rpn_batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        rpn_pre_nms_topk=(cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN, cfg.MODEL.RPN.PRE_NMS_TOPK_TEST),
        rpn_post_nms_topk=(cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN, cfg.MODEL.RPN.POST_NMS_TOPK_TEST),
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        rpn_loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        roi_batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        use_text_emb=cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER,
        temperature=cfg.MODEL.CLIP.CLSS_TEMP,
        focal_gamma=float(focal) if focal is not None else None,
        bg_loss_weight=float(bgw) if bgw is not None else None,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        mask_on=cfg.MODEL.MASK_ON,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_cls_agnostic=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
        mask_canvas_stride=float(cfg.TPU.MASK_CANVAS_STRIDE),
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
        keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
        keypoint_loss_normalizer=(
            -1.0
            if cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
            else cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS
            * cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
            * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION
        ),
        no_box_delta=cfg.MODEL.CLIP.NO_BOX_DELTA,
        multiply_rpn_score=cfg.MODEL.CLIP.MULTIPLY_RPN_SCORE,
        soft_nms_enabled=cfg.MODEL.ROI_HEADS.SOFT_NMS_ENABLED,
        soft_nms_method=cfg.MODEL.ROI_HEADS.SOFT_NMS_METHOD,
        soft_nms_sigma=cfg.MODEL.ROI_HEADS.SOFT_NMS_SIGMA,
        soft_nms_prune=cfg.MODEL.ROI_HEADS.SOFT_NMS_PRUNE,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        region_consistency_boxes=cfg.TPU.REGION_CONSISTENCY_BOXES,
        v2l_image_size=cfg.TPU.V2L_IMAGE_SIZE,
        v2l_mapper_layers=cfg.TPU.V2L_MAPPER_LAYERS,
        v2l_mapper_tokens=cfg.TPU.V2L_MAPPER_TOKENS,
        backbone_remat=cfg.TPU.REMAT_BACKBONE,
        use_pallas_roi_align=cfg.TPU.PALLAS_ROI_ALIGN,
        roi_chunk_size=cfg.TPU.ROI_CHUNK_SIZE,
        pipeline_axis=cfg.TPU.PIPELINE_AXIS or None,
        pipeline_microbatches=cfg.TPU.PIPELINE_MICROBATCHES,
        moe_experts=cfg.TPU.MOE.NUM_EXPERTS,
        moe_capacity_factor=cfg.TPU.MOE.CAPACITY_FACTOR,
        moe_expert_axis=cfg.TPU.MOE.EXPERT_AXIS or None,
        moe_aux_weight=cfg.TPU.MOE.AUX_WEIGHT,
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_fpn_rcnn(cfg):
    """GeneralizedRCNN with BACKBONE.NAME=build_resnet_fpn_backbone — the
    reference's Base-RCNN-FPN family (d2 ResNet + FPN, multi-level RPN over
    p2..p6, StandardROIHeads 2-FC box head + optional mask head)."""
    from .fpn_rcnn import FPNRCNN

    # d2 FPN convention: one anchor size per level ([[32],[64],...]); a flat
    # single group is spread over the 5 levels by doubling (d2
    # anchor_generator _broadcast_params semantics for the common configs)
    groups = list(cfg.MODEL.ANCHOR_GENERATOR.SIZES)
    if len(groups) == 5:
        sizes = tuple(g[0] if isinstance(g, (list, tuple)) else g for g in groups)
    else:
        flat = [s for g in groups for s in (g if isinstance(g, (list, tuple)) else [g])]
        sizes = tuple(flat[:5]) if len(flat) >= 5 else tuple(flat[0] * 2 ** i for i in range(5))
    return FPNRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        mask_on=cfg.MODEL.MASK_ON,
        # ROI_HEADS.NAME=CascadeROIHeads on the FPN family (Misc/
        # cascade_mask_rcnn_*) swaps in the cascade heads
        cascade=cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads",
        # CLIP ModifiedResNet bottom-up under the FPN (reference
        # build_clip_resnet_fpn_backbone, clip_backbone.py:664)
        backbone_type="clip" if "clip" in cfg.MODEL.BACKBONE.NAME else "d2_resnet",
        anchor_sizes=sizes,
        anchor_aspect_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        rpn_batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        rpn_pre_nms_topk=(cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN, cfg.MODEL.RPN.PRE_NMS_TOPK_TEST),
        rpn_post_nms_topk=(cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN, cfg.MODEL.RPN.POST_NMS_TOPK_TEST),
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        rpn_loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
        rpn_smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        roi_smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
        roi_batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
        score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_canvas_stride=float(cfg.TPU.MASK_CANVAS_STRIDE),
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
        keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
        keypoint_loss_normalizer=(
            -1.0
            if cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
            else cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS
            * cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
            * cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION
        ),
        use_text_emb=cfg.MODEL.CLIP.USE_TEXT_EMB_CLASSIFIER,
        temperature=cfg.MODEL.CLIP.CLSS_TEMP,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        backbone_width=cfg.TPU.BACKBONE_WIDTH or cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        backbone_norm=cfg.MODEL.RESNETS.NORM,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        deform_modulated=cfg.MODEL.RESNETS.DEFORM_MODULATED,
        box_num_conv=cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
        box_conv_dim=cfg.MODEL.ROI_BOX_HEAD.CONV_DIM,
        box_num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC or 2,
        box_conv_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
        fpn_norm=cfg.MODEL.FPN.NORM,
        mask_conv_norm=cfg.MODEL.ROI_MASK_HEAD.NORM,
        box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
        box_reg_loss_weight=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT,
        rpn_box_reg_loss_type=cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE,
        rpn_box_reg_loss_weight=cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        mask_cls_agnostic=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
        dc5=cfg.MODEL.RESNETS.RES5_DILATION == 2,
        load_proposals=cfg.MODEL.PROPOSAL_GENERATOR.NAME == "PrecomputedProposals",
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_retinanet(cfg):
    from .retinanet import RetinaNet

    r = cfg.MODEL.RETINANET
    sizes = tuple(tuple(float(x) for x in lvl) for lvl in cfg.MODEL.ANCHOR_GENERATOR.SIZES)
    if len(sizes) == 1:
        # d2 DefaultAnchorGenerator broadcasts a single size list over all
        # feature levels; RetinaNet has 5 (p3..p7)
        sizes = sizes * 5
    return RetinaNet(
        num_classes=r.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        anchor_sizes=sizes,
        aspect_ratios=tuple(float(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        iou_thresholds=tuple(r.IOU_THRESHOLDS),
        iou_labels=tuple(r.IOU_LABELS),
        focal_alpha=r.FOCAL_LOSS_ALPHA,
        focal_gamma=r.FOCAL_LOSS_GAMMA,
        smooth_l1_beta=r.SMOOTH_L1_LOSS_BETA,
        box_reg_loss_type=r.BBOX_REG_LOSS_TYPE,
        head_norm=r.NORM,
        score_thresh=r.SCORE_THRESH_TEST,
        nms_thresh=r.NMS_THRESH_TEST,
        topk_candidates=r.TOPK_CANDIDATES_TEST,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_clip_fast_rcnn(cfg):
    from .backbone.clip_resnet import RESNET_SPECS as _SPECS

    from .clip_rcnn import CLIPFastRCNN

    layers, width = _SPECS[cfg.MODEL.RESNETS.DEPTH]
    return CLIPFastRCNN(
        backbone_layers=tuple(layers),
        backbone_width=width,
        embed_dim=EMBED_DIMS[cfg.MODEL.RESNETS.DEPTH],
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        offline_rpn_nms_thresh=cfg.MODEL.CLIP.OFFLINE_RPN_NMS_THRESH,
        temperature=cfg.MODEL.CLIP.CLSS_TEMP,
        focal_gamma=cfg.MODEL.CLIP.FOCAL_SCALED_LOSS,
        bg_loss_weight=cfg.MODEL.CLIP.BG_CLS_LOSS_WEIGHT,
        no_box_delta=cfg.MODEL.CLIP.NO_BOX_DELTA,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_pretrain_fast_rcnn(cfg):
    """RegionCLIP pretraining arch (reference clip_rcnn.py PretrainFastRCNN +
    configs/pretrain/RegionCLIP_RN50.yaml)."""
    from .clip_rcnn import PretrainFastRCNN

    depth = cfg.MODEL.RESNETS.DEPTH
    layers, width = RESNET_SPECS[depth]
    if list(cfg.TPU.BACKBONE_LAYERS):
        layers = list(cfg.TPU.BACKBONE_LAYERS)
    if cfg.TPU.BACKBONE_WIDTH:
        width = cfg.TPU.BACKBONE_WIDTH
    embed_dim = cfg.TPU.EMBED_DIM or EMBED_DIMS[depth]
    return PretrainFastRCNN(
        backbone_layers=tuple(layers),
        backbone_width=width,
        embed_dim=embed_dim,
        concept_dim=embed_dim,
        num_concepts=cfg.MODEL.CLIP.PRETRAIN_NUM_CONCEPTS,
        num_regions=cfg.MODEL.CLIP.PRETRAIN_SAMPLE_REGIONS or 36,
        concept_thresh=cfg.MODEL.CLIP.CONCEPT_THRES or 0.1,
        text_vocab_size=cfg.MODEL.CLIP.TEXT_VOCAB_SIZE,
        text_context_length=cfg.MODEL.CLIP.TEXT_CONTEXT_LENGTH,
        text_width=cfg.MODEL.CLIP.TEXT_WIDTH,
        text_heads=cfg.MODEL.CLIP.TEXT_HEADS,
        text_layers=cfg.MODEL.CLIP.TEXT_LAYERS,
        pipeline_axis=cfg.TPU.PIPELINE_AXIS or None,
        pipeline_microbatches=cfg.TPU.PIPELINE_MICROBATCHES,
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_panoptic_fpn(cfg):
    from .panoptic_fpn import PanopticFPN

    return PanopticFPN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        sem_seg_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        instance_loss_weight=cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT,
        sem_seg_loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        sem_seg_norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
        # Misc/panoptic_fpn_R_101_dconv_cascade_gn_3x: GN backbone/FPN,
        # DCN on res3-res5, CascadeROIHeads
        backbone_norm=cfg.MODEL.RESNETS.NORM,
        fpn_norm=cfg.MODEL.FPN.NORM,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        deform_modulated=cfg.MODEL.RESNETS.DEFORM_MODULATED,
        cascade=cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads",
        backbone_width=cfg.TPU.BACKBONE_WIDTH,
        mask_on=cfg.MODEL.MASK_ON,
        mask_num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
        mask_conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
        mask_canvas_stride=float(cfg.TPU.MASK_CANVAS_STRIDE),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_rotated_fast_rcnn(cfg):
    from .rotated_rcnn import RotatedFastRCNN

    return RotatedFastRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )


def build_model(cfg):
    """cfg.MODEL.META_ARCHITECTURE -> flax module (params are created
    separately with module.init — JAX models are pure functions)."""
    name = cfg.MODEL.META_ARCHITECTURE
    builder = {
        "GeneralizedRCNN": build_generalized_rcnn,
        "RetinaNet": build_retinanet,
        "CLIPFastRCNN": build_clip_fast_rcnn,
        "PretrainFastRCNN": build_pretrain_fast_rcnn,
        "PanopticFPN": build_panoptic_fpn,
        "RotatedFastRCNN": build_rotated_fast_rcnn,
        "CascadeRCNN": build_cascade_rcnn,
        "SemanticSegmentor": build_semantic_segmentor,
        "ProposalNetwork": build_proposal_network,
    }.get(name)
    # the reference reaches cascade via ROI_HEADS.NAME inside GeneralizedRCNN;
    # on the FPN family (Misc/cascade_mask_rcnn_*_FPN_*) the FPNRCNN assembly
    # carries the cascade heads (build_fpn_rcnn sets cascade=True), the C4
    # form uses the CascadeRCNN meta-arch
    if (
        name == "GeneralizedRCNN"
        and cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads"
        and "fpn_backbone" not in cfg.MODEL.BACKBONE.NAME
    ):
        builder = build_cascade_rcnn
    # ... and the FPN family via BACKBONE.NAME=build_resnet_fpn_backbone
    # (reference Base-RCNN-FPN.yaml)
    elif name == "GeneralizedRCNN" and "fpn_backbone" in cfg.MODEL.BACKBONE.NAME:
        builder = build_fpn_rcnn
    # ... and DC5 (reference Base-RCNN-DilatedC5.yaml: dilated stride-16
    # res5 as the single feature map + StandardROIHeads) — same FPNRCNN
    # assembly in single-level mode
    elif name == "GeneralizedRCNN" and cfg.MODEL.RESNETS.RES5_DILATION == 2:
        builder = build_fpn_rcnn
    if builder is None:
        if name in META_ARCH_REGISTRY:
            builder = META_ARCH_REGISTRY.get(name)
        else:
            raise KeyError(f"Unknown META_ARCHITECTURE: {name}")
    return builder(cfg)


@META_ARCH_REGISTRY.register()
def build_cascade_rcnn(cfg):
    from .cascade_rcnn import CascadeRCNN

    depth = cfg.MODEL.RESNETS.DEPTH
    return CascadeRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        depth=depth,
        in_channels=256 if depth in (18, 34) else 1024,
        stage_ious=tuple(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)
        if "ROI_BOX_CASCADE_HEAD" in cfg.MODEL
        else (0.5, 0.6, 0.7),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_semantic_segmentor(cfg):
    from .extra_meta_archs import SemanticSegmentor

    return SemanticSegmentor(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        depth=cfg.MODEL.RESNETS.DEPTH,
        ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
        in_features=tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES),
        head_norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )


@META_ARCH_REGISTRY.register()
def build_proposal_network(cfg):
    from .extra_meta_archs import FPNProposalNetwork, ProposalNetwork

    if "fpn_backbone" in cfg.MODEL.BACKBONE.NAME:
        # reference rpn_R_50_FPN_1x.yaml (RPN-only on Base-RCNN-FPN)
        groups = list(cfg.MODEL.ANCHOR_GENERATOR.SIZES)
        sizes = tuple(
            g[0] if isinstance(g, (list, tuple)) else g for g in groups
        ) if len(groups) == 5 else (32, 64, 128, 256, 512)
        return FPNProposalNetwork(
            depth=cfg.MODEL.RESNETS.DEPTH,
            anchor_sizes=sizes,
            pre_nms_topk=(cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN, cfg.MODEL.RPN.PRE_NMS_TOPK_TEST),
            post_nms_topk=(cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN, cfg.MODEL.RPN.POST_NMS_TOPK_TEST),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            backbone_width=cfg.TPU.BACKBONE_WIDTH,
            dtype=_dtype(cfg),
        )
    return ProposalNetwork(
        depth=cfg.MODEL.RESNETS.DEPTH,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=_dtype(cfg),
    )
