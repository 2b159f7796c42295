"""RetinaNet meta-arch, TTA wrapper, multi-level pooler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch
from cddmsl_tpu.models.poolers import ROIPooler, assign_boxes_to_levels
from cddmsl_tpu.models.retinanet import RetinaNet


@pytest.fixture(scope="module")
def retinanet():
    from cddmsl_tpu.utils.testing import materialize_params

    model = RetinaNet(num_classes=8, depth=10, topk_candidates=64, detections_per_image=20)
    batch = _synthetic_batch(2, 64, 96, g=4)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(lambda r, b: model.init({"params": r}, b, r), rng, batch)
    return model, params, batch


def test_retinanet_losses_finite(retinanet):
    model, params, batch = retinanet
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_retinanet_empty_gt(retinanet):
    model, params, batch = retinanet
    empty = batch._replace(gt_valid=jnp.zeros_like(batch.gt_valid))
    losses = model.apply(params, empty, jax.random.PRNGKey(1))
    assert float(losses["loss_box_reg"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


def test_retinanet_inference_shapes(retinanet):
    model, params, batch = retinanet
    det = model.apply(params, batch, method=model.inference)
    assert det.boxes.shape == (2, 20, 4)
    assert ((np.asarray(det.scores) >= 0) & (np.asarray(det.scores) <= 1)).all()


def test_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 32, 32.0],  # tiny -> min level
            [0, 0, 224, 224.0],  # canonical -> level 4
            [0, 0, 1000, 1000.0],  # huge -> max level
        ]
    )
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5))
    assert lv[0] == 2 and lv[1] == 4 and lv[2] == 5


def test_multilevel_pooler_selects_levels(rng):
    feats = [jnp.asarray(rng.rand(32, 32, 4).astype(np.float32)) for _ in range(3)]
    pooler = ROIPooler(7, scales=(1 / 4, 1 / 8, 1 / 16), sampling_ratio=2, min_level=2)
    boxes = jnp.asarray([[0, 0, 40, 40.0], [0, 0, 500, 500.0]])
    out = pooler(feats, boxes)
    assert out.shape == (2, 7, 7, 4)
    # box 0 -> level 2 (finest); verify equals direct single-level pooling
    from cddmsl_tpu.ops.roi_align import roi_align

    direct = roi_align(feats[0], boxes[:1], (7, 7), 1 / 4, 2, True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(direct[0]), rtol=1e-5)


def test_tta_flip_merging(retinanet):
    model, params, batch = retinanet
    from cddmsl_tpu.models.tta import GeneralizedRCNNWithTTA

    tta = GeneralizedRCNNWithTTA(model, params, flip=True)
    det = tta(batch)
    assert det.boxes.shape[0] == 2
    b = np.asarray(det.boxes)[np.asarray(det.valid)]
    if len(b):
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
