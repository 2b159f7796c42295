"""Full-scale flagship torch parity (r3 VERDICT next-round #2).

The toy-scale harnesses (test_torch_parity.py WIDTH=16/IMG=64,
test_torch_parity_detector.py WIDTH=16/IMG=128) retire converter and
composed-pipeline risk but never exercise the regime the real model runs in.
This module runs the REAL flagship spec ONCE per suite run:

    RN50 layers (3,4,6,3), width 64, embed 1024, attnpool heads 32,
    input 800x1344 (the production pad bucket), batch 1, fp32,
    Precision.HIGHEST matmuls

against the same reference-faithful torch/numpy oracle
(test_torch_parity_detector.RefDetector), weights flowing through
checkpoint/convert_torch's d2_rcnn dialect exactly as a real RegionCLIP
checkpoint load would (reference clip_backbone.py:664-729 build path).

Pins: res4 features, per-region res5+attnpool embeddings, post-NMS
detections, and the composed train losses under exhaustive sampling
(rpn_batch 65536 >= 50*84*15 anchors). Each is the full-scale regime where
converter indexing, attnpool positional-embedding sizing, blur-pool at real
depths, or padding-bucket math could silently diverge (r3 VERDICT weak #2).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import test_torch_parity_detector as D  # noqa: E402

LAYERS = (3, 4, 6, 3)
WIDTH = 64
EMBED = 1024
IMG_HW = (800, 1344)
RPN_BATCH = 65536  # >= anchor count at 50x84x15: exhaustive sampling
GT = [([[120, 200, 720, 700], [300, 90, 1000, 520], [900, 400, 1300, 780]], [0, 3, 5])]


@pytest.fixture(scope="module")
def fullscale(tmp_path_factory):
    from cddmsl_tpu.checkpoint.convert_torch import load_rcnn_weights
    from cddmsl_tpu.utils.testing import materialize_params

    ref = D.RefDetector(layers=LAYERS, width=WIDTH, embed=EMBED, img_hw=IMG_HW,
                        rpn_batch=RPN_BATCH)
    path = tmp_path_factory.mktemp("ckpt") / "ref_rn50.pth"
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in ref.state_dict_d2().items()}},
        str(path),
    )
    model = D._jax_model(layers=LAYERS, width=WIDTH, embed=EMBED, rpn_batch=RPN_BATCH)
    batch = D._batch(img_hw=IMG_HW, B=1)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all),
        jax.random.PRNGKey(0), batch,
    )
    params = load_rcnn_weights(params, str(path))
    return ref, model, params


def test_fullscale_res4_and_region_embed(fullscale):
    """Full-depth RN50 res4 at 800x1344 + res5/attnpool region embeddings on
    fixed RoIs — tower-level parity at production scale."""
    ref, model, params = fullscale
    batch = D._batch(img_hw=IMG_HW, B=1)
    rois = np.asarray(
        [[64, 48, 512, 400], [400, 300, 1280, 760], [0, 0, 160, 160], [1000, 80, 1340, 380]],
        np.float32,
    )

    with jax.default_matmul_precision("highest"):
        def _feats(m, b, r):
            feats = m.backbone(m._normalize(b.image))["res4"]
            emb = m.roi_heads._region_embed(
                feats, jnp.asarray(r)[None], m.backbone.res5_forward, m.backbone.attnpool_forward
            )
            return feats, emb

        got_res4, got_emb = model.apply(params, batch, rois, method=_feats)

    x = ref.normalize(D._np_images(batch))
    want_res4 = ref.res4(x)
    want_emb = ref.region_embed(want_res4, rois)

    got_res4 = np.transpose(np.asarray(got_res4), (0, 3, 1, 2))
    np.testing.assert_allclose(got_res4, want_res4.numpy(), atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_emb), want_emb, atol=5e-3, rtol=1e-3)


def test_fullscale_inference_detections(fullscale):
    """Composed eval pipeline at production scale: same post-NMS detection
    set (count, classes), boxes/scores numerically equal."""
    ref, model, params = fullscale
    batch = D._batch(img_hw=IMG_HW, B=1)
    with jax.default_matmul_precision("highest"):
        det = model.apply(params, batch, False, method=model.inference)
    want = ref.inference(D._np_images(batch))

    wb, ws, wc = want[0]
    valid = np.asarray(det.valid[0])
    gb = np.asarray(det.boxes[0])[valid]
    gs = np.asarray(det.scores[0])[valid]
    gc = np.asarray(det.classes[0])[valid]
    assert len(gb) == len(wb), f"{len(gb)} vs oracle {len(wb)} detections"
    np.testing.assert_array_equal(gc, wc)
    np.testing.assert_allclose(gs, ws, atol=5e-3, rtol=2e-3)
    np.testing.assert_allclose(gb, wb, atol=0.5)


def test_fullscale_train_loss_parity(fullscale):
    """Composed train losses at production scale under exhaustive sampling."""
    ref, model, params = fullscale
    batch = D._batch(with_gt=True, img_hw=IMG_HW, B=1, gt_spec=GT)
    with jax.default_matmul_precision("highest"):
        losses = model.apply(
            params, batch, jax.random.PRNGKey(17), method=model.supervised_losses
        )
    gtb = np.asarray(batch.gt_boxes)
    gtc = np.asarray(batch.gt_classes)
    gtv = np.asarray(batch.gt_valid)
    want = ref.losses(
        D._np_images(batch), [gtb[0][gtv[0]]], [gtc[0][gtv[0]]]
    )
    for k in ("loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"):
        got = float(losses[k])
        np.testing.assert_allclose(got, want[k], rtol=1e-2, atol=2e-4, err_msg=k)
