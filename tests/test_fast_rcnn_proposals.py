"""Fast R-CNN with precomputed proposals (reference PROPOSAL_GENERATOR.NAME
=PrecomputedProposals + data/build.py load_proposals_into_dataset +
detection_utils.py transform_proposals + fast_rcnn_R_50_FPN_1x.yaml):
proposal files load into dataset dicts, ride the mapper's TransformList,
collate into DetBatch.proposal_*, and drive the RPN-less FPNRCNN."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.models import DetBatch, build_model

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _cfg():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, "COCO-Detection/fast_rcnn_R_50_FPN_1x.yaml"))
    cfg.MODEL.RESNETS.DEPTH = 10
    cfg.TPU.BACKBONE_WIDTH = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 32
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST = 16
    return cfg


def _batch(p=32):
    B, H, W = 2, 64, 96
    r = np.random.RandomState(0)
    boxes = np.zeros((B, p, 4), np.float32)
    x0 = r.uniform(0, 60, (B, p)); y0 = r.uniform(0, 40, (B, p))
    boxes[..., 0] = x0; boxes[..., 1] = y0
    boxes[..., 2] = x0 + r.uniform(4, 30, (B, p))
    boxes[..., 3] = y0 + r.uniform(4, 20, (B, p))
    return DetBatch(
        image=jnp.asarray(r.rand(B, H, W, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        orig_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 56, 52], [30, 20, 90, 60]]] * B, jnp.float32),
        gt_classes=jnp.asarray(r.randint(0, 80, (B, 2)), jnp.int32),
        gt_valid=jnp.ones((B, 2), bool),
        proposal_boxes=jnp.asarray(boxes),
        proposal_scores=jnp.asarray(r.randn(B, p).astype(np.float32)),
        proposal_valid=jnp.ones((B, p), bool),
    )


def test_fast_rcnn_builds_without_rpn():
    model = build_model(_cfg())
    assert type(model).__name__ == "FPNRCNN" and model.load_proposals
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)
    assert "proposal_generator" not in params["params"]  # RPN-less
    losses = model.apply(params, batch, jax.random.PRNGKey(1))
    assert "loss_rpn_cls" not in losses and "loss_rpn_loc" not in losses
    for k in ("loss_cls", "loss_box_reg"):
        assert k in losses and np.isfinite(float(losses[k])), (k, losses.get(k))
    det = jax.device_get(model.apply(params, batch, method=model.inference))
    assert det.boxes.shape == (2, 16, 4)


def test_proposal_file_to_detbatch(tmp_path):
    """Proposal pickle -> dicts -> mapper transform (resize scales boxes,
    topk by objectness) -> pad_and_collate -> DetBatch.proposal_*."""
    from cddmsl_tpu.data.build import pad_and_collate
    from cddmsl_tpu.data.proposals import load_proposals_into_dataset, transform_proposals
    from cddmsl_tpu.data.transforms import ResizeTransform, TransformList

    data = {
        "ids": ["img0"],
        "boxes": [np.asarray([[0, 0, 10, 10], [5, 5, 30, 30], [2, 2, 4, 4]], np.float32)],
        "objectness_logits": [np.asarray([0.1, 0.9, 0.5], np.float32)],
    }
    pf = tmp_path / "props.pkl"
    with open(pf, "wb") as f:
        pickle.dump(data, f)
    dicts = [{"image_id": "img0", "file_name": "x"}, {"image_id": "missing", "file_name": "y"}]
    dicts = load_proposals_into_dataset(dicts, str(pf))
    assert dicts[0]["proposal_boxes"].shape == (3, 4)
    assert "proposal_boxes" not in dicts[1]

    # 2x resize from 50x50 -> 100x100, keep top 2 by objectness
    tfms = TransformList([ResizeTransform(50, 50, 100, 100)])
    out = transform_proposals(dicts[0], (100, 100), tfms, topk=2)
    np.testing.assert_allclose(out["proposal_boxes"][0], [10, 10, 60, 60])  # score 0.9 first
    np.testing.assert_allclose(out["proposal_objectness"], [0.9, 0.5])

    sample = {
        "image": np.zeros((100, 100, 3), np.float32),
        "hw": np.asarray([100, 100], np.int32),
        "orig_hw": np.asarray([50, 50], np.int32),
        "boxes": np.zeros((0, 4), np.float32),
        "classes": np.zeros((0,), np.int32),
        **out,
    }
    batch = pad_and_collate([sample], (128, 128), max_gt=4, with_trgt=False, max_proposals=8)
    assert batch.proposal_boxes.shape == (1, 8, 4)
    assert int(batch.proposal_valid.sum()) == 2
    np.testing.assert_allclose(np.asarray(batch.proposal_boxes[0, 0]), [10, 10, 60, 60])
    assert np.asarray(batch.proposal_scores)[0, 2] == -np.inf  # padding
