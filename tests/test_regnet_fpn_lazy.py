"""RegNet bottom-up under the FPN + the lazy-config zoo twins (reference
configs/COCO-InstanceSegmentation/mask_rcnn_regnet{x,y}_4gf_dds_fpn_1x.py,
new_baselines regnet LSJ recipes, and the .py twins of the yaml zoo)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cddmsl_tpu.config.lazy import LazyConfig, instantiate  # noqa: E402
from cddmsl_tpu.models import DetBatch  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(REPO, "configs")


def test_regnet_fpn_rcnn_train_and_inference():
    from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

    model = FPNRCNN(
        num_classes=3,
        backbone_type="regnet",
        regnet_spec=(16.0, 16, 2.0, 8, 8, 0.25),  # tiny RegNetY
        fpn_out_channels=32,
        fc_dim=64,
        emb_dim=64,
        use_text_emb=False,
        mask_on=False,
        rpn_pre_nms_topk=(64, 32),
        rpn_post_nms_topk=(32, 16),
        roi_batch_size_per_image=16,
        detections_per_image=8,
        pixel_mean=(103.53, 116.28, 123.675),
        pixel_std=(1.0, 1.0, 1.0),
    )
    r = np.random.RandomState(0)
    batch = DetBatch(
        image=jnp.asarray(r.rand(1, 64, 96, 3).astype(np.float32) * 255),
        image_sizes=jnp.asarray([[64, 96]], jnp.int32),
        orig_sizes=jnp.asarray([[64, 96]], jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 40, 40.0]]]),
        gt_classes=jnp.asarray([[1]], jnp.int32),
        gt_valid=jnp.ones((1, 1), bool),
    )
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    losses = model.apply(params, batch, jax.random.PRNGKey(1), method=model.supervised_losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape == (1, 8, 4)


@pytest.mark.parametrize(
    "rel",
    [
        "COCO-Detection/retinanet_R_50_FPN_1x.py",
        "COCO-InstanceSegmentation/mask_rcnn_R_50_C4_1x.py",
        "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.py",
        "COCO-InstanceSegmentation/mask_rcnn_regnetx_4gf_dds_fpn_1x.py",
        "COCO-InstanceSegmentation/mask_rcnn_regnety_4gf_dds_fpn_1x.py",
        "COCO-Keypoints/keypoint_rcnn_R_50_FPN_1x.py",
        "COCO-PanopticSegmentation/panoptic_fpn_R_50_1x.py",
    ],
)
def test_lazy_zoo_twins_load_and_instantiate(rel):
    path = os.path.join(CFG, rel)
    model = instantiate(LazyConfig.load(path, "model"))
    assert hasattr(model, "apply")
    opt = instantiate(LazyConfig.load(path, "optimizer"))
    assert opt is not None
    train = LazyConfig.load(path, "train")
    assert train["max_iter"] > 0
    dl = LazyConfig.load(path, "dataloader")
    assert "train" in dl and "test" in dl


@pytest.mark.parametrize("x,ep", [("x", 100), ("x", 400), ("y", 200)])
def test_regnet_lsj_recipes_load(x, ep):
    path = os.path.join(
        CFG, "new_baselines", f"mask_rcnn_regnet{x}_4gf_dds_FPN_{ep}ep_LSJ.py"
    )
    model = instantiate(LazyConfig.load(path, "model"))
    assert model.backbone_type == "regnet"
    assert (model.regnet_spec[-1] > 0) == (x == "y")  # SE only on RegNetY
    train = LazyConfig.load(path, "train")
    assert train["max_iter"] == 184375 * (ep // 100)
