"""Synthetic `detectron2` package for reference-code-in-the-loop oracles.

Used by tests/test_reference_detops_oracle.py and
tests/test_reference_fast_rcnn_oracle.py: installs stub parent packages so
the reference's heavyweight `__init__` chain (fvcore, torchvision, CUDA
extensions) never executes, then imports the ACTUAL reference leaf modules
by normal import machinery (relative imports intact). Only trivial leaf
symbols are shimmed; every shim is listed here in one place so the oracle
tests can state exactly what is and is not reference code.
"""

import importlib
import os
import sys
import types
from dataclasses import dataclass

import torch
import torch.nn.functional as F

REF = "/root/reference/detectron2"


def _fake_module(name, path=None, **attrs):
    m = types.ModuleType(name)
    if path is not None:
        m.__path__ = [path]
    # a real ModuleSpec: transformers probes importlib.util.find_spec
    # ("detectron2"), which raises ValueError on modules whose __spec__ is
    # None (as raw ModuleType objects are)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None, is_package=path is not None)
    if path is not None:
        m.__spec__.submodule_search_locations = [path]
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _MiniRegistry:
    """detectron2.utils.registry.Registry — the 15 lines the reference
    modules actually use."""

    __doc__ = ""

    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None):
        if obj is None:
            def deco(cls):
                self._map[cls.__name__] = cls
                return cls

            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]


def smooth_l1_loss(input, target, beta, reduction="none"):
    """fvcore.nn.smooth_l1_loss shim (canonical definition; fvcore is not
    installed here)."""
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        loss = torch.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def torch_nms(boxes, scores, iou_threshold):
    """Greedy NMS with torchvision.ops.nms semantics (keep indices sorted by
    descending score), in pure torch — torchvision is not installed here."""
    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        lt = torch.maximum(boxes[i, :2], boxes[rest, :2])
        rb = torch.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


def torch_batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.batched_nms via the coordinate-offset trick — the exact
    formulation detectron2/layers/nms.py:16-43 wraps."""
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.long, device=boxes.device)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    return torch_nms(boxes + offsets[:, None], scores, iou_threshold)


def _cross_entropy(input, target, *, reduction="mean", **kwargs):
    """detectron2.layers.cross_entropy shim: F.cross_entropy with the
    empty-input guard (layers/wrappers.py)."""
    if target.numel() == 0 and reduction == "mean":
        return input.sum() * 0.0
    return F.cross_entropy(input, target, reduction=reduction, **kwargs)


class _DummyStorage:
    def put_scalar(self, *a, **k):
        pass

    def put_scalars(self, *a, **k):
        pass


@dataclass
class ShapeSpec:
    channels: int = None
    height: int = None
    width: int = None
    stride: int = None


def _load_by_path(name, path):
    """Import a reference file OUTSIDE the synthetic package (for files whose
    canonical module name is occupied by a shim, e.g. config/config.py whose
    name detectron2.config.config is the CfgNode host shim). Only functions
    without relative imports at module level are usable from such modules."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def build_ref_pkg():
    """Install the stub package tree (idempotent) and return a namespace of
    the imported reference modules."""
    if not os.path.isdir(REF):
        return None
    if "detectron2" not in sys.modules or not getattr(
        sys.modules["detectron2"], "_cddmsl_oracle_stub", False
    ):
        for k in [k for k in sys.modules if k == "detectron2" or k.startswith("detectron2.")]:
            del sys.modules[k]
        d2 = _fake_module("detectron2")
        d2._cddmsl_oracle_stub = True
        _fake_module("detectron2.modeling", path=os.path.join(REF, "modeling"))
        _fake_module("detectron2.modeling.roi_heads", path=os.path.join(REF, "modeling", "roi_heads"))
        structures = _fake_module("detectron2.structures", path=os.path.join(REF, "structures"))
        # layers gets a real __path__ so PURE-TORCH reference layer files
        # (soft_nms.py) import for real; the CUDA-backed ones stay shimmed
        _fake_module(
            "detectron2.layers",
            path=os.path.join(REF, "layers"),
            nonzero_tuple=lambda x: torch.nonzero(x, as_tuple=True),
            cat=lambda ts, dim=0: ts[0] if len(ts) == 1 else torch.cat(ts, dim),
            cross_entropy=_cross_entropy,
            batched_nms=torch_batched_nms,
            nms=torch_nms,
            ShapeSpec=ShapeSpec,
            # name-only: poolers.py imports these; ROIPooler.forward (which
            # would call them) is not under test — assign_boxes_to_levels is
            ROIAlign=object,
            ROIAlignRotated=object,
        )

        def _no_cuda_ext(*a, **k):
            raise NotImplementedError("CUDA extension not available in the oracle shim")

        _fake_module("detectron2.layers.rotated_boxes", pairwise_iou_rotated=_no_cuda_ext)
        _fake_module(
            "detectron2.modeling.backbone", path=os.path.join(REF, "modeling", "backbone")
        )
        utils = _fake_module("detectron2.utils")
        utils.env = _fake_module(
            "detectron2.utils.env",
            TORCH_VERSION=tuple(int(x) for x in torch.__version__.split(".")[:2]),
        )
        _fake_module("detectron2.utils.registry", Registry=_MiniRegistry)
        _fake_module("detectron2.utils.events", get_event_storage=lambda: _DummyStorage())
        _fake_module("detectron2.utils.memory", retry_if_cuda_oom=lambda f: f)
        _fake_module(
            "detectron2.modeling.proposal_generator.build",
            PROPOSAL_GENERATOR_REGISTRY=_MiniRegistry("PROPOSAL_GENERATOR"),
        )
        # single-process shims for the reference's SyncBN support code
        # (layers/batch_norm.py imports these; FrozenBatchNorm2d — the class
        # under test — never calls them)
        utils.comm = _fake_module(
            "detectron2.utils.comm",
            get_world_size=lambda: 1,
            get_rank=lambda: 0,
        )
        # detectron2.config: real __path__ so the reference's defaults.py
        # (the full config-surface definition) imports for real; its
        # `from .config import CfgNode` resolves to OUR CfgNode via the
        # pre-registered fake submodule (data host only — the keys/values
        # under test come from executing the reference file)
        _fake_module(
            "detectron2.config", path=os.path.join(REF, "config"), configurable=lambda f: f
        )
        from cddmsl_tpu.config.cfg_node import CfgNode as _RepoCfgNode

        class _OurCfgNode(_RepoCfgNode):
            """Accepts yacs' `new_allowed` kwarg (merge-time semantics only;
            irrelevant to the default-surface comparison)."""

            def __init__(self, init_dict=None, new_allowed=False):
                super().__init__(init_dict)

        _fake_module("detectron2.config.config", CfgNode=_OurCfgNode)
        _fake_module("fvcore.common.config", CfgNode=_OurCfgNode)
        if "fvcore" not in sys.modules:
            _fake_module("fvcore")
        _fake_module("fvcore.nn", smooth_l1_loss=smooth_l1_loss, giou_loss=None)
        _fake_module(
            "fvcore.nn.weight_init",
            c2_msra_fill=lambda m: None,
            c2_xavier_fill=lambda m: None,
        )
        _fake_module("fvcore.nn.distributed", differentiable_all_reduce=lambda x: x)

        # name-only bases for solver/lr_scheduler.py: the legacy torch
        # schedulers under test (WarmupMultiStepLR/WarmupCosineLR) never
        # touch these fvcore ParamScheduler classes
        class _UnusedParamScheduler:
            def __init__(self, *a, **k):
                raise NotImplementedError("fvcore ParamScheduler shim: not under test")

        _fake_module("fvcore.common")
        _fake_module(
            "fvcore.common.param_scheduler",
            CompositeParamScheduler=_UnusedParamScheduler,
            ConstantParamScheduler=_UnusedParamScheduler,
            LinearParamScheduler=_UnusedParamScheduler,
            ParamScheduler=_UnusedParamScheduler,
        )

        wrappers_m = importlib.import_module("detectron2.layers.wrappers")
        sys.modules["detectron2.layers"].Conv2d = wrappers_m.Conv2d
        boxes_m = importlib.import_module("detectron2.structures.boxes")
        structures.Boxes = boxes_m.Boxes
        structures.pairwise_iou = boxes_m.pairwise_iou
        rot_m = importlib.import_module("detectron2.structures.rotated_boxes")
        structures.RotatedBoxes = rot_m.RotatedBoxes
        structures.pairwise_iou_rotated = _no_cuda_ext
        inst_m = importlib.import_module("detectron2.structures.instances")
        structures.Instances = inst_m.Instances
        structures.ImageList = importlib.import_module(
            "detectron2.structures.image_list"
        ).ImageList
        structures.ROIMasks = None  # CUDA-free placeholder (postprocess-only)

        # ---- extra leaves for the CDDMSL meta-arch (meta_arch/rcnn.py) ----
        _fake_module("detectron2.modeling.meta_arch", path=os.path.join(REF, "modeling", "meta_arch"))
        _fake_module(
            "detectron2.modeling.meta_arch.build", META_ARCH_REGISTRY=_MiniRegistry("META_ARCH")
        )
        _fake_module(
            "detectron2.modeling.backbone.clipcap",
            path=os.path.join(REF, "modeling", "backbone", "clipcap"),
        )
        _fake_module(
            "detectron2.modeling.proposal_generator",
            path=os.path.join(REF, "modeling", "proposal_generator"),
            build_proposal_generator=None,
        )
        sys.modules["detectron2.modeling.roi_heads"].build_roi_heads = None
        bb_base = importlib.import_module("detectron2.modeling.backbone.backbone")
        sys.modules["detectron2.modeling.backbone"].Backbone = bb_base.Backbone
        sys.modules["detectron2.modeling.backbone"].build_backbone = None
        _fake_module("detectron2.data")
        _fake_module("detectron2.solver", path=os.path.join(REF, "solver"))
        _fake_module("detectron2.data.samplers", path=os.path.join(REF, "data", "samplers"))
        _fake_module("detectron2.data.detection_utils", convert_image_to_rgb=None)
        _fake_module("detectron2.data.transforms")
        _fake_module("detectron2.data.transforms.torchvision_transforms")
        _fake_module(
            "detectron2.data.transforms.torchvision_transforms.transforms", Normalize=object
        )
        _fake_module("detectron2.utils.logger", log_first_n=lambda *a, **k: None)
        if "torchvision" not in sys.modules:
            # only the NAMES are needed at import time; the preprocess
            # methods that would call these are not under test
            class _InterpolationMode:
                BICUBIC = "bicubic"
                NEAREST = "nearest"
                BILINEAR = "bilinear"

            tv = _fake_module("torchvision")
            tv.transforms = _fake_module(
                "torchvision.transforms", Resize=object, CenterCrop=object
            )
            _fake_module("torchvision.transforms.functional", InterpolationMode=_InterpolationMode)
            # name-only: modeling/poolers.py imports RoIPool (the torchvision
            # pooling op itself is never constructed by the oracle tests)
            tv.ops = _fake_module("torchvision.ops", RoIPool=object)
        # numpy 2.x removed the numpy.lib.pad alias and the np.bool alias
        # the reference uses (meta_arch/rcnn.py:5, pascal_voc_evaluation.py)
        import numpy as _np
        import numpy.lib as _nplib

        if not hasattr(_nplib, "pad"):
            _nplib.pad = _np.pad
        if not hasattr(_np, "bool"):
            _np.bool = bool
        # VOC evaluator leaves
        class _PassthroughPathManager:
            @staticmethod
            def open(path, mode="r", **kw):
                return open(path, mode, **kw)

        sys.modules["detectron2.data"].MetadataCatalog = None
        _fake_module("detectron2.utils.file_io", PathManager=_PassthroughPathManager)
        _fake_module("detectron2.evaluation", path=os.path.join(REF, "evaluation"))
        _fake_module("detectron2.evaluation.evaluator", DatasetEvaluator=object)
        # clipcap.py leaf shims (same trio as tests/test_clipcap_reference_oracle.py)
        if "clip" not in sys.modules:
            _fake_module("clip")
        if "tqdm" not in sys.modules:
            _fake_module("tqdm", tqdm=lambda it=None, **k: it, trange=lambda n, **k: range(n))
        import transformers

        if not hasattr(transformers, "AdamW"):
            transformers.AdamW = torch.optim.AdamW

    return types.SimpleNamespace(
        boxes=importlib.import_module("detectron2.structures.boxes"),
        rotated_boxes=importlib.import_module("detectron2.structures.rotated_boxes"),
        instances=importlib.import_module("detectron2.structures.instances"),
        matcher=importlib.import_module("detectron2.modeling.matcher"),
        sampling=importlib.import_module("detectron2.modeling.sampling"),
        box_regression=importlib.import_module("detectron2.modeling.box_regression"),
        anchor_generator=importlib.import_module("detectron2.modeling.anchor_generator"),
        soft_nms=importlib.import_module("detectron2.layers.soft_nms"),
        fast_rcnn=importlib.import_module("detectron2.modeling.roi_heads.fast_rcnn"),
        clip_backbone=importlib.import_module("detectron2.modeling.backbone.clip_backbone"),
        clipcap=importlib.import_module("detectron2.modeling.backbone.clipcap.clipcap"),
        gather=importlib.import_module("detectron2.modeling.backbone.clipcap.gather"),
        meta_rcnn=importlib.import_module("detectron2.modeling.meta_arch.rcnn"),
        pascal_voc=importlib.import_module("detectron2.evaluation.pascal_voc_evaluation"),
        poolers=importlib.import_module("detectron2.modeling.poolers"),
        postprocessing=importlib.import_module("detectron2.modeling.postprocessing"),
        lr_scheduler=importlib.import_module("detectron2.solver.lr_scheduler"),
        config_defaults=importlib.import_module("detectron2.config.defaults"),
        config_config=_load_by_path(
            "d2_ref_config_config", os.path.join(REF, "config", "config.py")
        ),
        proposal_utils=importlib.import_module(
            "detectron2.modeling.proposal_generator.proposal_utils"
        ),
        mask_ops=importlib.import_module("detectron2.layers.mask_ops"),
        keypoints=importlib.import_module("detectron2.structures.keypoints"),
        distributed_sampler=importlib.import_module(
            "detectron2.data.samplers.distributed_sampler"
        ),
        image_list=importlib.import_module("detectron2.structures.image_list"),
        ShapeSpec=ShapeSpec,
    )
