"""Pallas RoIAlign kernel vs the XLA formulation (interpret mode on CPU;
the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.ops.pallas.roi_align_pallas import roi_align_pallas
from cddmsl_tpu.ops.roi_align import roi_align


@pytest.fixture
def data(rng):
    feat = jnp.asarray(rng.rand(24, 32, 8).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [
                [0, 0, 320, 320],
                [56, 35.2, 318.4, 192],
                [100, 100, 101, 101],
                [-50, -50, 10, 10],
            ],
            np.float32,
        )
    )
    return feat, rois


def test_forward_matches_xla(data):
    feat, rois = data
    a = roi_align_pallas(feat, rois, (7, 7), 1 / 16, 2, True)
    b = roi_align(feat, rois, (7, 7), 1 / 16, 2, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_backward_matches_xla(data):
    feat, rois = data
    g1 = jax.grad(lambda f: jnp.sum(roi_align_pallas(f, rois, (7, 7), 1 / 16, 2, True) ** 2))(feat)
    g2 = jax.grad(lambda f: jnp.sum(roi_align(f, rois, (7, 7), 1 / 16, 2, True) ** 2))(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_pooled_shape_14(data):
    feat, rois = data
    out = roi_align_pallas(feat, rois, (14, 14), 1 / 16, 2, True)
    assert out.shape == (4, 14, 14, 8)


def test_pallas_v2_oracle_interpret():
    """Blocked v2 kernel: fwd+bwd exact vs the XLA path in interpret mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cddmsl_tpu.ops.pallas.roi_align_pallas import roi_align_pallas_v2
    from cddmsl_tpu.ops.roi_align import roi_align

    r = np.random.RandomState(0)
    H, W, C, R = 20, 28, 8, 8
    f = jnp.asarray(r.rand(H, W, C).astype(np.float32))
    boxes = np.zeros((R, 4), np.float32)
    boxes[:, 0] = r.rand(R) * 200
    boxes[:, 1] = r.rand(R) * 150
    boxes[:, 2] = boxes[:, 0] + 30 + r.rand(R) * 150
    boxes[:, 3] = boxes[:, 1] + 30 + r.rand(R) * 100
    boxes = jnp.asarray(boxes)

    got = roi_align_pallas_v2(f, boxes, (7, 7), 1 / 16.0, 2, 4, True)
    want = roi_align(f, boxes, (7, 7), 1 / 16.0, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    gp = jax.grad(lambda x: jnp.sum(roi_align_pallas_v2(x, boxes, (7, 7), 1 / 16.0, 2, 4, True) ** 2))(f)
    gx = jax.grad(lambda x: jnp.sum(roi_align(x, boxes, (7, 7), 1 / 16.0, 2, True) ** 2))(f)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-4)
