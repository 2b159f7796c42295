"""Mean-teacher trainer step: burn-up gating, pseudo-labels, EMA snapshot,
discriminator update (the reconstruction of the reference's missing
rcnn_mt.py, SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.config import add_ateacher_config


@pytest.fixture(scope="module")
def mt():
    cfg = _flagship_cfg(tiny=True)
    add_ateacher_config(cfg)
    cfg.SEMISUPNET.Trainer = "ateacher"
    cfg.SEMISUPNET.BURN_UP_STEP = 5
    cfg.SEMISUPNET.BBOX_THRESHOLD = 0.5
    cfg.TPU.MAX_GT_BOXES = 8
    cfg.TPU.MESH_SHAPE = [1]
    from cddmsl_tpu.engine.mean_teacher import MeanTeacherTrainer

    trainer = MeanTeacherTrainer(cfg)
    b = _synthetic_batch(2, 64, 96, g=8)
    return trainer, b


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(x, y) for x, y in zip(la, lb))


def _fresh(trainer):
    """Deep copy: mt_step donates its input state, so each test needs its own
    buffers (and a host-side reference copy for comparisons)."""
    host = jax.device_get(trainer.mt_state)
    return jax.tree_util.tree_map(jnp.array, host), host


def test_burnup_step_no_pseudo_losses(mt):
    trainer, b = mt
    state, host = _fresh(trainer)
    new_state, metrics = trainer.mt_step(state, b, b, b, b, jax.random.PRNGKey(0))
    assert float(metrics["loss_cls_pseudo"]) == 0.0
    assert float(metrics["loss_D"]) == 0.0
    assert float(metrics["loss_cls"]) > 0.0
    # teacher untouched during burn-up (rate==1 keeps teacher)
    assert _leaves_equal(new_state.teacher_params, host.teacher_params)
    # student moved
    assert not _leaves_equal(new_state.params, host.params)


def test_boundary_snapshots_teacher(mt):
    trainer, b = mt
    state, _ = _fresh(trainer)
    state = state.replace(step=jnp.asarray(5, jnp.int32))  # == BURN_UP_STEP
    new_state, _ = trainer.mt_step(state, b, b, b, b, jax.random.PRNGKey(1))
    # rate==0: teacher == new student params exactly
    assert _leaves_equal(new_state.teacher_params, new_state.params)


def test_post_burnup_pseudo_and_discriminator(mt):
    trainer, b = mt
    state, host = _fresh(trainer)
    state = state.replace(step=jnp.asarray(6, jnp.int32))
    new_state, metrics = trainer.mt_step(state, b, b, b, b, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["loss_D"]) > 0.0
    # discriminator trained
    assert not _leaves_equal(new_state.dis_params, host.dis_params)
    # EMA: teacher moved toward the student — on a TRAINABLE leaf (frozen
    # leaves never move in the student, so their EMA is exactly a no-op)
    old_t = host.teacher_params["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    new_t = new_state.teacher_params["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    assert not np.array_equal(np.asarray(old_t), np.asarray(new_t))


def test_pseudo_label_threshold(mt):
    trainer, b = mt
    boxes, classes, valid = trainer._pseudo_label(trainer.mt_state.teacher_params, b)
    assert boxes.shape[1] == trainer.cfg.TPU.MAX_GT_BOXES
    # untrained model rarely crosses 0.5 threshold, but validity must be bool
    assert valid.dtype == bool


def test_compute_val_loss(mt):
    trainer, b = mt
    losses = trainer.compute_val_loss(b)
    assert {"loss_cls", "loss_box_reg", "loss_rpn_cls", "loss_rpn_loc"} <= set(losses)
    assert all(np.isfinite(v) for v in losses.values())
    # pure monitoring: the student params must be untouched
    host = jax.device_get(trainer.mt_state.params)
    again = trainer.compute_val_loss(b)
    assert losses == again  # deterministic with the fixed default rng
