"""Serving-path int8 PTQ of the res5 RoI stage (cddmsl_tpu/quant/ptq.py).

Checks: (1) FrozenBN folding is exact vs the flax module forward, (2) the
int8 forward tracks the fp forward closely on realistic (relu-positive)
inputs, (3) the quantized inference seam (models/rcnn.py inference
quant_res5 + engine make_eval_step_quant) produces finite detections whose
region scores track the fp step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.models.backbone.clip_resnet import ModifiedResNet
from cddmsl_tpu.quant import (
    calibrate_res5,
    fold_res5,
    merge_absmax,
    quantize_res5,
    res5_forward_fp_folded,
    res5_forward_int8,
    scales_from_absmax,
)

W = 16  # tiny width: res4 channels = 16*W, res5 = 32*W


def _randomize(params, seed=0):
    """Real-looking weights: normal convs, positive running_var, off-center
    BN stats — exercises the folding math properly."""
    r = np.random.RandomState(seed)

    def one(path, leaf):
        name = str(path[-1].key)
        shape = leaf.shape
        if name == "running_var":
            return jnp.asarray(0.5 + r.rand(*shape), jnp.float32)
        if name in ("running_mean", "bias"):
            return jnp.asarray(r.randn(*shape) * 0.1, jnp.float32)
        if name == "weight":
            return jnp.asarray(0.8 + 0.4 * r.rand(*shape), jnp.float32)
        fan_in = int(np.prod(shape[:-1])) or 1
        return jnp.asarray(r.randn(*shape) / np.sqrt(fan_in), leaf.dtype)

    return jax.tree_util.tree_map_with_path(one, params)


@pytest.fixture(scope="module")
def backbone():
    m = ModifiedResNet(layers=(1, 1, 1, 2), output_dim=64, heads=2, width=W)

    def init_fn(mod, x, crops):
        mod(x)
        return mod.attnpool_forward(mod.res5_forward(crops))

    v = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((2, 14, 14, 16 * W)),
        method=init_fn,
    )
    params = _randomize(v["params"])
    return m, {"params": params}


def _crops(n=8, seed=3):
    # relu-positive res4-like activations with realistic dynamic range
    r = np.random.RandomState(seed)
    return jnp.asarray(np.maximum(r.randn(n, 14, 14, 16 * W) * 1.5, 0), jnp.float32)


def test_fold_matches_module(backbone):
    m, variables = backbone
    x = _crops()
    ref = m.apply(variables, x, method=m.res5_forward)
    folded = fold_res5(variables["params"])
    got = res5_forward_fp_folded(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_int8_tracks_fp(backbone):
    m, variables = backbone
    bp = variables["params"]
    calib_batches = [_crops(seed=s) for s in (1, 2)]
    absmax = None
    for c in calib_batches:
        absmax = merge_absmax(absmax, jax.device_get(calibrate_res5(bp, c)))
    scales = scales_from_absmax(absmax)
    qblocks = quantize_res5(bp)

    x = _crops(seed=9)  # held-out batch
    ref = np.asarray(m.apply(variables, x, method=m.res5_forward), np.float32)
    got = np.asarray(res5_forward_int8(qblocks, scales, x), np.float32)

    # relative L2 error of the res5 output tensor
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel
    # per-crop feature cosine (what the attnpool/classifier consume)
    a = got.reshape(got.shape[0], -1)
    b = ref.reshape(ref.shape[0], -1)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9)
    assert cos.min() > 0.995, cos.min()


def test_quant_inference_seam():
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from cddmsl_tpu.engine.train_loop import make_calib_step, make_eval_step, make_eval_step_quant
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.quant import prepare_quant_res5

    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    batch = _synthetic_batch(2, 64, 96, g=4)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, batch, rng, method=model.init_all)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # concrete
    # randomize so quantization sees non-degenerate weights
    variables = {"params": _randomize(variables["params"], seed=5)}

    crops = make_calib_step(model)(variables, batch)
    qblocks, scales = prepare_quant_res5(variables["params"]["backbone"], [crops])

    fp = make_eval_step(model)(variables, batch)
    q = make_eval_step_quant(model, qblocks, scales)(variables, batch)

    assert q.boxes.shape == fp.boxes.shape
    assert bool(jnp.all(jnp.isfinite(q.boxes)))
    assert bool(jnp.all(jnp.isfinite(q.scores)))
    # scores of kept detections track fp closely (same candidate ordering
    # is NOT guaranteed through NMS; compare the score distributions)
    fs = np.sort(np.asarray(fp.scores).ravel())
    qs = np.sort(np.asarray(q.scores).ravel())
    assert np.abs(fs - qs).max() < 0.05
