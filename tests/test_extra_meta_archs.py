import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _synthetic_batch
from cddmsl_tpu.models.extra_meta_archs import (
    KRCNNConvDeconvUpsampleHead,
    ProposalNetwork,
    SemanticSegmentor,
    keypoint_rcnn_loss,
)


def test_proposal_network():
    from cddmsl_tpu.utils.testing import materialize_params

    model = ProposalNetwork(depth=10)
    batch = _synthetic_batch(1, 64, 96, g=4)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(lambda r, b: model.init({"params": r}, b, r), rng, batch)
    losses = model.apply(params, batch, rng)
    assert {"loss_rpn_cls", "loss_rpn_loc"} == set(losses)
    assert all(np.isfinite(float(v)) for v in losses.values())
    props = model.apply(params, batch, method=model.inference)
    assert props.boxes.shape[0] == 1


def test_semantic_segmentor(rng):
    model = SemanticSegmentor(num_classes=7, depth=10)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255)
    gt = jnp.asarray(rng.randint(0, 7, (1, 64, 64)))
    gt = gt.at[0, :8].set(255)  # ignore region
    params = model.init(jax.random.PRNGKey(0), imgs, gt)
    losses = model.apply(params, imgs, gt)
    assert np.isfinite(float(losses["loss_sem_seg"]))
    pred = model.apply(params, imgs, method=model.inference)
    assert pred.shape == (1, 64, 64)
    assert int(pred.max()) < 7


def test_keypoint_head(rng):
    head = KRCNNConvDeconvUpsampleHead(num_keypoints=5, conv_dims=(32, 32))
    x = jnp.asarray(rng.rand(3, 14, 14, 16).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)
    hm = head.apply(params, x)
    assert hm.shape == (3, 56, 56, 5)
    pos = jnp.asarray(rng.randint(0, 56 * 56, (3, 5)))
    vis = jnp.asarray(rng.rand(3, 5) > 0.3)
    loss = keypoint_rcnn_loss(hm, pos, vis)
    assert np.isfinite(float(loss)) and float(loss) > 0
