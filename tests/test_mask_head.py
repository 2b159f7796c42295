import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.models.mask_head import (
    MaskRCNNConvUpsampleHead,
    mask_rcnn_inference,
    mask_rcnn_loss,
    paste_masks_in_image,
)


def test_mask_head_shapes_and_loss(rng):
    head = MaskRCNNConvUpsampleHead(num_classes=5, num_conv=2, conv_dim=16)
    x = jnp.asarray(rng.rand(4, 14, 14, 8).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (4, 28, 28, 5)

    gt = jnp.asarray((rng.rand(4, 28, 28) > 0.5).astype(np.float32))
    classes = jnp.asarray([0, 1, 2, 3])
    valid = jnp.asarray([True, True, False, True])
    loss = mask_rcnn_loss(logits, gt, classes, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0

    probs = mask_rcnn_inference(logits, classes)
    assert probs.shape == (4, 28, 28)
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()


def test_paste_masks():
    # a solid box-space mask pasted into a 20x20 image at box (5,5)-(15,15)
    masks = jnp.ones((1, 8, 8))
    boxes = jnp.asarray([[5.0, 5, 15, 15]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (20, 20)))
    assert out.shape == (1, 20, 20)
    assert out[0, 10, 10]  # center on
    assert not out[0, 2, 2]  # outside box off
    assert not out[0, 18, 18]
