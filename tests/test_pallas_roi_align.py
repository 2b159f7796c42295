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
