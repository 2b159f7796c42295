"""Train-step integration: optimizer + burn-up gating + freezing, on a tiny
synthetic setup (multi-device by virtue of the 8-device CPU conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.engine import TrainState, make_eval_step, make_train_step
from cddmsl_tpu.models import build_model
from cddmsl_tpu.parallel import create_mesh, replicate, shard_batch
from cddmsl_tpu.solver import build_lr_schedule, build_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(2, 64, 96, g=4)
    from cddmsl_tpu.utils.testing import materialize_params

    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    optimizer = build_optimizer(cfg, params)
    return cfg, model, optimizer, params, batch


def test_train_step_updates_and_freezes(setup):
    cfg, model, optimizer, params, batch = setup
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(cfg.SOLVER.CAPTION_BURNUP_ITERS + 1, jnp.int32))
    step_fn = make_train_step(
        model, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg), donate=False,
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["cont_loss"]) > 0  # past burn-up: caption loss live
    assert float(metrics["cont_loss_region"]) > 0
    assert int(new_state.step) == int(state.step) + 1

    p0 = params["params"]
    p1 = new_state.params["params"]
    # frozen subtrees unchanged
    for sub in ("offline_backbone", "v2l_mapper"):
        a = jax.tree_util.tree_leaves(p0[sub])
        b = jax.tree_util.tree_leaves(p1[sub])
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), sub
    np.testing.assert_array_equal(
        p0["roi_heads"]["box_predictor"]["cls_score_weight"],
        p1["roi_heads"]["box_predictor"]["cls_score_weight"],
    )
    np.testing.assert_array_equal(
        p0["backbone"]["conv1"]["kernel"], p1["backbone"]["conv1"]["kernel"]
    )  # freeze_at=2: stem frozen
    # trainable parts moved
    assert not np.array_equal(
        p0["backbone"]["layer3_0"]["conv1"]["kernel"],
        p1["backbone"]["layer3_0"]["conv1"]["kernel"],
    )
    assert not np.array_equal(
        p0["proposal_generator"]["head"]["conv"]["kernel"],
        p1["proposal_generator"]["head"]["conv"]["kernel"],
    )


def test_burnup_gates_caption_losses(setup):
    cfg, model, optimizer, params, batch = setup
    state = TrainState.create(params, optimizer)  # step 0 < burnup
    step_fn = make_train_step(
        model, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS, donate=False,
    )
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert float(metrics["cont_loss"]) == 0.0
    assert float(metrics["kd_loss"]) == 0.0
    assert float(metrics["cont_loss_region"]) == 0.0
    assert float(metrics["loss_cls"]) > 0.0


def test_train_step_sharded_over_mesh(setup):
    cfg, model, optimizer, params, batch = setup
    n = min(8, len(jax.devices()))
    mesh = create_mesh((n,), ("data",))
    batch8 = _synthetic_batch(n, 64, 96, g=4)
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(cfg.SOLVER.CAPTION_BURNUP_ITERS + 1, jnp.int32))
    with jax.sharding.set_mesh(mesh):
        state = replicate(state, mesh)
        batch8 = shard_batch(batch8, mesh)
        step_fn = make_train_step(
            model, optimizer, enable_caption=True, kd_regularization=True,
            caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS, donate=False,
        )
        _, metrics = step_fn(state, batch8, jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # InfoNCE over the GLOBAL batch: n rows -> loss ~ ln(n) at init
    assert abs(float(metrics["cont_loss"]) - np.log(n)) < 1.0
