"""CLIP ModifiedResNet bottom-up under the FPN (reference
build_clip_resnet_fpn_backbone, clip_backbone.py:664 — the RegionCLIP LVIS
FPN transfer recipe, configs/LVISv1-InstanceSegmentation/
mask_rcnn_CLIP_R_50_FPN_1x.yaml)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.models import DetBatch  # noqa: E402


def _batch():
    r = np.random.RandomState(0)
    h, w = 64, 96
    return DetBatch(
        image=jnp.asarray(r.rand(1, h, w, 3).astype(np.float32) * 255),
        image_sizes=jnp.asarray([[h, w]], jnp.int32),
        orig_sizes=jnp.asarray([[h, w]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60.0]]]),
        gt_classes=jnp.asarray([[0, 1]], jnp.int32),
        gt_valid=jnp.ones((1, 2), bool),
        gt_masks=jnp.ones((1, 2, 16, 24), jnp.float32),
    )


def test_clip_fpn_rcnn_train_and_inference():
    from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

    model = FPNRCNN(
        num_classes=3,
        backbone_type="clip",
        clip_layers=(1, 1, 1, 1),
        backbone_width=16,
        emb_dim=64,
        fpn_out_channels=32,
        fc_dim=64,
        use_text_emb=False,
        mask_on=True,
        mask_num_conv=1,
        mask_conv_dim=16,
        rpn_pre_nms_topk=(64, 32),
        rpn_post_nms_topk=(32, 16),
        roi_batch_size_per_image=16,
        detections_per_image=8,
        pixel_mean=(0.48145466, 0.4578275, 0.40821073),
        pixel_std=(0.26862954, 0.26130258, 0.27577711),
    )
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    # CLIP bottom-up params present (blur-pool bottlenecks, frozen BN)
    assert "layer1_0" in params["params"]["backbone"] or any(
        k.startswith("layer") for k in params["params"]["backbone"]
    )
    losses = model.apply(params, batch, jax.random.PRNGKey(1), method=model.supervised_losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert "loss_mask" in losses
    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape == (1, 8, 4) and det.masks is not None


def test_clip_fpn_config_dispatch():
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.models import build_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(root, "LVISv1-InstanceSegmentation", "mask_rcnn_CLIP_R_50_FPN_1x.yaml")
    )
    m = build_model(cfg)
    assert type(m).__name__ == "FPNRCNN"
    assert m.backbone_type == "clip" and m.mask_on and m.num_classes == 1203
