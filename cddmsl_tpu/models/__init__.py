from .build import META_ARCH_REGISTRY, build_model
from .rcnn import DetBatch, GeneralizedRCNN, infonce_bidirectional
from .rpn import RPN, Proposals, StandardRPNHead
from .roi_heads import CLIPRes5ROIHeads
from .fast_rcnn import DetectionResult, FastRCNNOutputLayers
from .matcher import Matcher
from .clipcap import Projector, TransformerMapper, v2l

__all__ = [
    "META_ARCH_REGISTRY",
    "build_model",
    "DetBatch",
    "GeneralizedRCNN",
    "infonce_bidirectional",
    "RPN",
    "Proposals",
    "StandardRPNHead",
    "CLIPRes5ROIHeads",
    "DetectionResult",
    "FastRCNNOutputLayers",
    "Matcher",
    "Projector",
    "TransformerMapper",
    "v2l",
]
