"""Mesh-sharded evaluation: the jitted inference step over a data-sharded
batch matches the unsharded run exactly, and inference_on_dataset's
place_fn hook feeds it (the TPU-native form of the reference's
DDP-distributed eval — detectron2/evaluation/evaluator.py
inference_on_dataset + InferenceSampler shard-per-rank; here one SPMD
program rides every chip)."""

import jax
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.engine import make_eval_step
from cddmsl_tpu.models import build_model
from cddmsl_tpu.parallel import create_mesh, replicate, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device conftest mesh"
)


@pytest.fixture(scope="module")
def setup():
    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    init_batch = _synthetic_batch(8, 64, 96, g=4)  # init_all needs the trgt view
    from cddmsl_tpu.utils.testing import materialize_params

    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, init_batch
    )
    batch = _synthetic_batch(8, 64, 96, g=4, with_trgt=False)
    return cfg, model, params, batch


def test_sharded_eval_matches_unsharded(setup):
    cfg, model, params, batch = setup
    eval_step = make_eval_step(model)

    det_ref = jax.device_get(eval_step(params, batch))

    mesh = create_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh):
        p = replicate(params, mesh)
        b = shard_batch(batch, mesh)
        det_sh = jax.device_get(eval_step(p, b))

    np.testing.assert_array_equal(det_sh.valid, det_ref.valid)
    keep = np.asarray(det_ref.valid)
    np.testing.assert_array_equal(
        np.asarray(det_sh.classes)[keep], np.asarray(det_ref.classes)[keep]
    )
    np.testing.assert_allclose(
        np.asarray(det_sh.scores)[keep], np.asarray(det_ref.scores)[keep],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(det_sh.boxes)[keep], np.asarray(det_ref.boxes)[keep],
        rtol=1e-5, atol=1e-3,
    )


def test_inference_on_dataset_place_fn(setup):
    """place_fn is applied per batch: a sharded run through the public loop
    produces detections on the mesh."""
    cfg, model, params, batch = setup
    eval_step = make_eval_step(model)
    mesh = create_mesh((8,), ("data",))

    class _CountEval:
        tasks = ()

        def reset(self):
            self.n = 0

        def process(self, *a, **k):
            self.n += 1

        def evaluate(self):
            return {"bbox": {"AP50": 0.0}}

    metas = [{"image_id": i, "height": 64, "width": 96} for i in range(8)]
    loader = iter([(batch, metas)])
    from cddmsl_tpu.evaluation.evaluator import inference_on_dataset

    placed = []

    def place_fn(b):
        sb = shard_batch(b, mesh)
        placed.append(sb.image.sharding)
        return sb

    ev = _CountEval()
    with jax.sharding.set_mesh(mesh):
        res = inference_on_dataset(
            eval_step, replicate(params, mesh), loader, 8, ev, place_fn=place_fn
        )
    assert placed and "data" in str(placed[0].spec)
    assert "bbox" in res
