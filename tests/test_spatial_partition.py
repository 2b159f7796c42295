"""Spatial partitioning (parallel/mesh.py shard_batch spatial_axis): the
input images' H axis sharded over the 'model' mesh axis, so the full-res
backbone convs run on H-shards with XLA-inserted halo exchanges — the CNN
analogue of sequence parallelism. The reference's DDP (detectron2/engine/
launch.py) has no such axis; on TPU it is a layout annotation.

Verified on the 8-virtual-CPU-device conftest mesh: image leaves get the
P('data','model') layout (and only image leaves), the full CDDMSL train
step runs spatially sharded, DP x SP matches pure DP numerically, and SP
composes with the tensor-parallel param rules in one program.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.engine import TrainState, make_train_step
from cddmsl_tpu.models import build_model
from cddmsl_tpu.parallel import (
    create_mesh,
    replicate,
    rules_from_cfg,
    shard_batch,
    shard_params,
)
from cddmsl_tpu.solver import build_lr_schedule, build_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device conftest mesh"
)


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(8, 64, 96, g=4)
    from cddmsl_tpu.utils.testing import materialize_params

    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(cfg.SOLVER.CAPTION_BURNUP_ITERS + 1, jnp.int32))
    step_fn = make_train_step(
        model, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg), donate=False,
    )
    return cfg, state, step_fn, batch


def test_spatial_sharding_targets_only_images(setup):
    cfg, state, step_fn, batch = setup
    mesh = create_mesh((4, 2), ("data", "model"))
    b = shard_batch(batch, mesh, spatial_axis="model")
    # image + translated twin: H sharded
    assert b.image.sharding.spec == P("data", "model")
    assert b.image_trgt.sharding.spec == P("data", "model")
    # non-image leaves keep the plain batch layout (gt_boxes is (B,G,4))
    assert b.gt_boxes.sharding.spec == P("data")
    assert b.gt_classes.sharding.spec == P("data")


def test_indivisible_h_falls_back_to_batch_sharding():
    mesh = create_mesh((4, 2), ("data", "model"))
    x = {"image": np.zeros((8, 63, 96, 3), np.float32)}  # 63 % 2 != 0
    b = shard_batch(x, mesh, spatial_axis="model")
    assert b["image"].sharding.spec == P("data")


def test_sp_step_matches_dp(setup):
    cfg, state, step_fn, batch = setup
    rng = jax.random.PRNGKey(3)

    # pure DP reference
    mesh_dp = create_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh_dp):
        st = replicate(state, mesh_dp)
        b = shard_batch(batch, mesh_dp)
        _, metrics_dp = step_fn(st, b, rng)
        metrics_dp = jax.device_get(metrics_dp)

    # 4-way DP x 2-way SP, params replicated (isolates the spatial layout)
    mesh_sp = create_mesh((4, 2), ("data", "model"))
    with jax.sharding.set_mesh(mesh_sp):
        st = replicate(state, mesh_sp)
        b = shard_batch(batch, mesh_sp, spatial_axis="model")
        _, metrics_sp = step_fn(st, b, rng)
        metrics_sp = jax.device_get(metrics_sp)

    for k, v in metrics_sp.items():
        assert np.isfinite(float(v)), (k, float(v))
        # kd_loss: catastrophic-cancellation quantity, wobbles with mesh
        # reduction order alone (see test_tensor_parallel.py for the
        # replicated-params control measurement). rtol 1e-3 (vs the TP
        # test's 2e-4): XLA compiles different conv tilings for the
        # H-shard shapes, so fp32 activations drift in the last ulp and
        # the drift is amplified through RPN proposal-selection margins
        # into the box-reg sum (observed 2.5e-4 rel on loss_box_reg).
        atol = 1e-3 if k == "kd_loss" else 2e-5
        np.testing.assert_allclose(
            float(v), float(metrics_dp[k]), rtol=1e-3, atol=atol, err_msg=k
        )


def test_sp_composes_with_tp(setup):
    """SP input layout + TP param rules in one program: halo exchange on the
    backbone AND Megatron/res5 collectives together."""
    cfg, state, step_fn, batch = setup
    rng = jax.random.PRNGKey(3)

    mesh_dp = create_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh_dp):
        _, metrics_dp = step_fn(replicate(state, mesh_dp), shard_batch(batch, mesh_dp), rng)
        metrics_dp = jax.device_get(metrics_dp)

    mesh = create_mesh((4, 2), ("data", "model"))
    with jax.sharding.set_mesh(mesh):
        st = shard_params(state, mesh, rules_from_cfg(cfg))
        b = shard_batch(batch, mesh, spatial_axis="model")
        new_state, metrics = step_fn(st, b, rng)
        metrics = jax.device_get(metrics)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
        atol = 1e-3 if k == "kd_loss" else 2e-5
        np.testing.assert_allclose(
            float(v), float(metrics_dp[k]), rtol=2e-4, atol=atol, err_msg=k
        )
