from .clip_resnet import (
    AttentionPool2d,
    Bottleneck,
    FrozenBatchNorm,
    ModifiedResNet,
    build_clip_resnet_backbone_module,
)
from .text_encoder import (
    CLIPTextEncoder,
    VisualTransformer,
    build_clip_text_encoder_module,
    quick_gelu,
)

__all__ = [
    "AttentionPool2d",
    "Bottleneck",
    "FrozenBatchNorm",
    "ModifiedResNet",
    "build_clip_resnet_backbone_module",
    "CLIPTextEncoder",
    "VisualTransformer",
    "build_clip_text_encoder_module",
    "quick_gelu",
]
