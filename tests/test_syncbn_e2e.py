"""Trainable SyncBN inside the detector (reference configs/Misc/
mask_rcnn_R_50_FPN_3x_syncbn.yaml + layers/batch_norm.py NaiveSyncBatchNorm):
RESNETS/FPN/ROI_BOX_HEAD/ROI_MASK_HEAD NORM=SyncBN puts running statistics in
the flax 'batch_stats' collection, the train step applies with
mutable=['batch_stats'] (train_loop.py split_batch_stats), and the batch
statistics over the globally-sharded batch ARE cross-replica under the one
jitted step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.models import DetBatch, build_model
from cddmsl_tpu.models.fpn_rcnn import FPNRCNN

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _tiny_syncbn_model(**kw):
    return FPNRCNN(
        num_classes=3, depth=10, mask_on=True, backbone_width=4,
        num_groups=1, backbone_norm="SyncBN", fpn_norm="SyncBN",
        box_num_conv=1, box_conv_dim=16, box_num_fc=1, box_conv_norm="SyncBN",
        mask_conv_norm="SyncBN", mask_num_conv=1, mask_conv_dim=8,
        fc_dim=32, fpn_out_channels=16,
        rpn_pre_nms_topk=(64, 32), rpn_post_nms_topk=(32, 32),
        roi_batch_size_per_image=16, detections_per_image=8, **kw,
    )


def _batch(b=2):
    rng = np.random.RandomState(7)
    return DetBatch(
        image=jnp.asarray(rng.rand(b, 64, 64, 3) * 255, jnp.float32),
        image_sizes=jnp.asarray([[64, 64]] * b, jnp.int32),
        orig_sizes=jnp.asarray([[64, 64]] * b, jnp.int32),
        gt_boxes=jnp.asarray([[[8, 8, 30, 30], [40, 40, 60, 60]]] * b, jnp.float32),
        gt_classes=jnp.asarray([[0, 2]] * b, jnp.int32),
        gt_valid=jnp.asarray([[True, True]] * b),
        gt_masks=jnp.ones((b, 2, 16, 16), jnp.float32),
    )


def test_syncbn_config_propagates():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIGS, "Misc/mask_rcnn_R_50_FPN_3x_syncbn.yaml"))
    m = build_model(cfg)
    assert m.backbone_norm == "SyncBN" and m.fpn_norm == "SyncBN"
    assert (m.box_num_conv, m.box_num_fc, m.box_conv_norm) == (4, 1, "SyncBN")
    assert m.mask_conv_norm == "SyncBN" and m.mask_on
    assert cfg.TEST.PRECISE_BN.ENABLED
    cfg9 = get_cfg()
    cfg9.merge_from_file(
        os.path.join(CONFIGS, "Misc/scratch_mask_rcnn_R_50_FPN_9x_syncbn.yaml")
    )
    assert cfg9.MODEL.BACKBONE.FREEZE_AT == 0 and not cfg9.MODEL.RESNETS.STRIDE_IN_1X1


def test_syncbn_train_step_updates_stats_and_bn_params():
    """One make_train_step step: batch_stats move (forward-driven), bn
    weight/bias move (gradient-driven, i.e. NOT frozen), losses finite, and
    the eval step consumes the running stats without mutation."""
    from cddmsl_tpu.engine.train_loop import TrainState, make_eval_step, make_train_step

    model = _tiny_syncbn_model()
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method=model.init_all)
    assert "batch_stats" in variables
    stem = variables["params"]["backbone"]["stem_bn1"]
    assert set(stem) == {"weight", "bias"}  # running stats NOT in params
    assert "running_mean" in variables["batch_stats"]["backbone"]["stem_bn1"]

    opt = optax.sgd(0.05, momentum=0.9)
    state = TrainState.create(variables, opt)
    step = make_train_step(model, opt, enable_caption=False, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)

    old_rm = variables["batch_stats"]["backbone"]["stem_bn1"]["running_mean"]
    new_rm = new_state.params["batch_stats"]["backbone"]["stem_bn1"]["running_mean"]
    assert not np.allclose(np.asarray(old_rm), np.asarray(new_rm))
    # EMA with momentum 0.9 from zeros: new = 0.1 * batch_mean
    assert np.all(np.abs(np.asarray(new_rm)) < 1e3)
    old_w = np.asarray(variables["params"]["backbone"]["stem_bn1"]["weight"])
    new_w = np.asarray(new_state.params["params"]["backbone"]["stem_bn1"]["weight"])
    assert not np.allclose(old_w, new_w), "SyncBN weight must be trainable"

    # second step consumes the first step's state (opt_state structure holds)
    new_state2, _ = step(new_state, batch, jax.random.PRNGKey(3))

    det = make_eval_step(model)(new_state2.params, batch)
    assert det.boxes.shape == (2, 8, 4)


def test_syncbn_stats_are_global_under_mesh():
    """The mutated batch statistics on an 8-device data mesh equal the
    single-device run on the same global batch — sync-BN with zero plumbing
    (the global-view jit computes means over the full batch axis)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model = _tiny_syncbn_model()
    batch = _batch(b=8)
    variables = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method=model.init_all)

    def stats(vs, b):
        _, mut = model.apply(vs, b, jax.random.PRNGKey(2), False, True, False,
                             method=model.cddmsl_losses, mutable=["batch_stats"])
        return mut["batch_stats"]

    want = jax.jit(stats)(variables, batch)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    got = jax.jit(stats)(variables, sharded)
    for w, g in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        # sharded partial-sum reduction order wiggles the last float bits
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), rtol=1e-4, atol=1e-4)


def test_trainable_mask_syncbn_vs_frozenbn():
    """solver.build.trainable_mask: FrozenBN subtrees (running stats in
    params) freeze entirely; SyncBN bn-named weight/bias stay trainable."""
    from cddmsl_tpu.solver.build import trainable_mask

    params = {
        "backbone": {
            "stem_bn1": {"weight": jnp.ones(4), "bias": jnp.zeros(4)},  # SyncBN
            "res2_0": {"bn1": {"weight": jnp.ones(4), "bias": jnp.zeros(4),
                               "running_mean": jnp.zeros(4), "running_var": jnp.ones(4)}},
            "conv_x": {"kernel": jnp.ones((3, 3, 4, 4))},
        }
    }
    mask = trainable_mask(params, freeze_at=0)
    assert mask["backbone"]["stem_bn1"]["weight"] is True
    assert mask["backbone"]["stem_bn1"]["bias"] is True
    assert mask["backbone"]["res2_0"]["bn1"]["weight"] is False
    assert mask["backbone"]["res2_0"]["bn1"]["running_mean"] is False
    assert mask["backbone"]["conv_x"]["kernel"] is True


def test_syncbn_grad_accum_carries_stats():
    """ACCUM_STEPS>1: the scan carries batch_stats across microbatches, so
    two microbatches advance the EMA twice."""
    from cddmsl_tpu.engine.train_loop import TrainState, make_train_step

    model = _tiny_syncbn_model()
    batch = _batch(b=2)
    variables = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method=model.init_all)
    opt = optax.sgd(0.0)  # isolate the stats path
    state = TrainState.create(variables, opt)

    one = make_train_step(model, opt, enable_caption=False, donate=False)
    acc = make_train_step(model, opt, enable_caption=False, donate=False, accum_steps=2)
    s1, _ = one(state, batch, jax.random.PRNGKey(2))
    state2 = TrainState.create(variables, opt)
    s2, _ = acc(state2, batch, jax.random.PRNGKey(2))
    rm1 = np.asarray(s1.params["batch_stats"]["backbone"]["stem_bn1"]["running_mean"])
    rm2 = np.asarray(s2.params["batch_stats"]["backbone"]["stem_bn1"]["running_mean"])
    # both moved off the zero init, via different (1 vs 2) EMA applications
    assert np.abs(rm1).max() > 0 and np.abs(rm2).max() > 0


@pytest.mark.slow
def test_precise_bn_through_trainer(tmp_path):
    """TEST.PRECISE_BN wiring (reference hooks.py:397 PreciseBN): a
    compile-light syncbn-config DefaultTrainer re-estimates batch_stats from
    train batches in _maybe_precise_bn, leaving every other collection
    untouched."""
    from cddmsl_tpu.data.catalog import DatasetCatalog
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_coco
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    register_synthetic_coco(str(tmp_path), prefix="syncbn_fixture")
    try:
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(CONFIGS, "Misc/mask_rcnn_R_50_FPN_3x_syncbn.yaml"))
        cfg.OUTPUT_DIR = str(tmp_path / "out")
        cfg.DATASETS.TRAIN = ["syncbn_fixture_train"]
        cfg.DATASETS.TEST = []
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.RESNETS.DEPTH = 10
        cfg.TPU.BACKBONE_WIDTH = 8
        cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
        cfg.MODEL.ROI_BOX_HEAD.CONV_DIM = 16
        cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 1
        cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 8
        cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
        cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
        cfg.INPUT.MIN_SIZE_TRAIN = [96]
        cfg.INPUT.MAX_SIZE_TRAIN = 160
        cfg.SOLVER.IMS_PER_BATCH = 2
        cfg.TPU.PAD_SIZE_TRAIN = [96, 160]
        cfg.TPU.PAD_SIZE_TEST = [96, 160]
        cfg.TPU.MAX_GT_BOXES = 8
        cfg.TPU.MESH_SHAPE = [1]
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.FAST_INIT = True
        cfg.TEST.PRECISE_BN.NUM_ITER = 2

        trainer = DefaultTrainer(cfg)
        p0 = trainer.state.params
        assert "batch_stats" in p0
        p1 = trainer._maybe_precise_bn(cfg, p0)
        rm0 = np.asarray(p0["batch_stats"]["backbone"]["stem_bn1"]["running_mean"])
        rm1 = np.asarray(p1["batch_stats"]["backbone"]["stem_bn1"]["running_mean"])
        assert not np.allclose(rm0, rm1)  # re-estimated from real batches
        # differentiable collections untouched
        w0 = np.asarray(p0["params"]["backbone"]["stem_bn1"]["weight"])
        w1 = np.asarray(p1["params"]["backbone"]["stem_bn1"]["weight"])
        np.testing.assert_array_equal(w0, w1)
        # disabled -> no-op passthrough
        cfg.defrost()
        cfg.TEST.PRECISE_BN.ENABLED = False
        assert trainer._maybe_precise_bn(cfg, p0) is p0
    finally:
        from cddmsl_tpu.data.build import stop_all_prefetchers

        stop_all_prefetchers()
        for n in ("syncbn_fixture_train", "syncbn_fixture_val"):
            if n in DatasetCatalog:
                DatasetCatalog.remove(n)
