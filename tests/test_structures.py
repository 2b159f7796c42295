import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.structures import (
    BoxMode,
    ImageList,
    Instances,
    area,
    clip,
    matched_pairwise_iou,
    nonempty,
    pairwise_iou,
)


def test_pairwise_iou_against_numpy(rng):
    b1 = np.abs(rng.rand(12, 4)) * 100
    b1[:, 2:] += b1[:, :2] + 1
    b2 = np.abs(rng.rand(7, 4)) * 100
    b2[:, 2:] += b2[:, :2] + 1
    got = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))

    def np_iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[0] * wh[1]
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua

    want = np.array([[np_iou(a, b) for b in b2] for a in b1])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iou_zero_area_boxes():
    b1 = jnp.asarray([[0.0, 0, 0, 0]])
    b2 = jnp.asarray([[0.0, 0, 10, 10]])
    out = pairwise_iou(b1, b2)
    assert float(out[0, 0]) == 0.0
    assert np.isfinite(np.asarray(out)).all()


def test_matched_iou():
    b = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 5, 10]])
    out = matched_pairwise_iou(b, b)
    np.testing.assert_allclose(np.asarray(out), [1.0, 1.0])


def test_box_clip_and_nonempty():
    b = jnp.asarray([[-5.0, -5, 15, 15], [3, 3, 3, 8]])
    c = clip(b, (10, 12))
    np.testing.assert_allclose(np.asarray(c[0]), [0, 0, 12, 10])
    ne = nonempty(b)
    assert bool(ne[0]) and not bool(ne[1])


def test_boxmode_convert():
    xywh = jnp.asarray([[10.0, 20, 30, 40]])
    xyxy = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(np.asarray(xyxy[0]), [10, 20, 40, 60])
    back = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh))


def test_instances_pytree_roundtrip():
    inst = Instances(
        (480, 640),
        gt_boxes=jnp.zeros((10, 4)),
        gt_classes=jnp.zeros((10,), jnp.int32),
        valid=jnp.arange(10) < 3,
    )
    leaves, treedef = jax.tree_util.tree_flatten(inst)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.image_size == (480, 640)
    assert int(rebuilt.num_valid()) == 3
    assert len(rebuilt) == 10

    # works through jit
    @jax.jit
    def f(i: Instances):
        return i.replace(gt_boxes=i.gt_boxes + 1.0)

    out = f(inst)
    np.testing.assert_allclose(np.asarray(out.gt_boxes), np.ones((10, 4)))


def test_instances_pad_and_cat():
    a = Instances((10, 10), boxes=jnp.ones((3, 4)))
    b = a.pad_to(8)
    assert len(b) == 8
    assert int(b.num_valid()) == 3
    c = Instances.cat([b, b])
    assert len(c) == 16


def test_image_list_padding():
    imgs = [np.ones((480, 600, 3), np.float32), np.ones((400, 640, 3), np.float32)]
    il = ImageList.from_tensors(imgs, pad_size=(512, 640))
    assert il.tensor.shape == (2, 512, 640, 3)
    np.testing.assert_array_equal(np.asarray(il.image_sizes), [[480, 600], [400, 640]])
    # padded area is zero
    assert float(jnp.sum(il.tensor[0, 480:, :, :])) == 0.0
