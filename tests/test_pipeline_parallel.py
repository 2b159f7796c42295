"""Pipeline parallelism (parallel/pp.py): GPipe over homogeneous block
stacks via shard_map + ppermute.

The reference's only parallelism is process-per-GPU DDP
(detectron2/engine/launch.py) — no pipeline story. Here the in-graph
transformer stacks (ClipCap V2L mapper, CLIP text tower) pipeline over a
'pipe' mesh axis. The GPipe schedule is exact (same per-microbatch op
order as sequential application), so every test below asserts equality
against the plain sequential stack, not just finiteness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cddmsl_tpu.parallel import create_mesh
from cddmsl_tpu.parallel.pp import pipeline_blocks, stack_trees

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device conftest mesh"
)

DIM = 16


def _toy_blocks(n, key):
    ks = jax.random.split(key, n)
    return [
        {
            "w": jax.random.normal(k, (DIM, DIM), jnp.float32) * 0.3,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (DIM,), jnp.float32),
        }
        for k in ks
    ]


def _toy_apply(bp, x):
    return x + jnp.tanh(x @ bp["w"] + bp["b"])


def _sequential(blocks, x):
    for bp in blocks:
        x = _toy_apply(bp, x)
    return x


def test_pure_pipe_exact():
    """8 blocks over an 8-way pipe axis == sequential, bit-exact."""
    blocks = _toy_blocks(8, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 5, DIM))
    mesh = create_mesh((8,), ("pipe",))
    ref = _sequential(blocks, x)

    @jax.jit
    def run(stacked, xin):
        return pipeline_blocks(_toy_apply, stacked, xin, mesh, axis="pipe")

    out = run(stack_trees(blocks), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dp_x_pp_exact():
    """2-way DP x 4-way PP with the batch sharded over 'data': each data row
    pipelines its own shard; result == sequential on the global batch."""
    blocks = _toy_blocks(8, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, DIM))
    mesh = create_mesh((2, 4), ("data", "pipe"))
    ref = _sequential(blocks, x)

    @jax.jit
    def run(stacked, xin):
        return pipeline_blocks(
            _toy_apply, stacked, xin, mesh, axis="pipe", batch_spec=P("data")
        )

    out = run(stack_trees(blocks), x)
    # not bit-exact: sharding the batch over 'data' changes the matmul tile
    # shapes (4x16 vs 8x16) and therefore FP reduction order — a property of
    # DP itself, not of the pipeline schedule (which is bit-exact, see
    # test_pure_pipe_exact)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_more_microbatches_than_stages():
    """M > P shrinks the bubble; schedule stays exact (M=8 on a 4-stage pipe)."""
    blocks = _toy_blocks(4, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (16, DIM))
    mesh = create_mesh((4,), ("pipe",))
    ref = _sequential(blocks, x)
    out = jax.jit(
        lambda s, xin: pipeline_blocks(_toy_apply, s, xin, mesh, axis="pipe", microbatches=8)
    )(stack_trees(blocks), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gradients_match_sequential():
    """jax.grad through the scan/ppermute schedule == grad of the sequential
    stack (1F1B-equivalent backward for free)."""
    blocks = _toy_blocks(8, jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (8, DIM))
    tgt = jax.random.normal(jax.random.PRNGKey(8), (8, DIM))
    mesh = create_mesh((4,), ("pipe",))
    stacked = stack_trees(blocks)

    def loss_pipe(s, xin):
        out = pipeline_blocks(_toy_apply, s, xin, mesh, axis="pipe")
        return jnp.mean((out - tgt) ** 2)

    def loss_seq(s, xin):
        def body(a, bp):
            return _toy_apply(bp, a), None

        out, _ = jax.lax.scan(body, xin, s)
        return jnp.mean((out - tgt) ** 2)

    gp_s, gp_x = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
    gs_s, gs_x = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp_s), jax.tree_util.tree_leaves(gs_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x), rtol=1e-6, atol=1e-6)


def _mapper(pipeline_axis=None):
    from cddmsl_tpu.models.clipcap import TransformerMapper

    return TransformerMapper(
        dim_clip=32,
        dim_embedding=24,
        prefix_length=4,
        clip_length=4,
        num_layers=4,
        num_heads=2,
        pipeline_axis=pipeline_axis,
    )


def test_transformer_mapper_pipelined_parity():
    """ClipCap V2L mapper (models/clipcap.py): pipeline_axis='pipe' under a
    DP x PP set_mesh == plain sequential apply with the SAME params (the
    checkpoint layout is unchanged by the setup()-style refactor)."""
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 32))
    params = _mapper().init(jax.random.PRNGKey(10), x)["params"]
    assert "layers_0" in params and "layers_3" in params  # ckpt naming kept
    ref = _mapper().apply({"params": params}, x)
    mesh = create_mesh((2, 4), ("data", "pipe"))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda p, a: _mapper("pipe").apply({"params": p}, a))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def _text_encoder(pipeline_axis=None):
    from cddmsl_tpu.models.backbone.text_encoder import CLIPTextEncoder

    return CLIPTextEncoder(
        embed_dim=24,
        context_length=12,
        vocab_size=64,
        width=16,
        heads=2,
        layers=4,
        pipeline_axis=pipeline_axis,
    )


def test_text_encoder_pipelined_parity():
    """CLIP text tower: 4 resblocks pipelined over 'pipe' == sequential,
    same params (resblocks_i naming preserved)."""
    text = jax.random.randint(jax.random.PRNGKey(11), (8, 12), 0, 63)
    text = text.at[:, -1].set(63)  # EOT = highest id
    params = _text_encoder().init(jax.random.PRNGKey(12), text)["params"]
    assert "resblocks_0" in params and "resblocks_3" in params
    ref = _text_encoder().apply({"params": params}, text)
    mesh = create_mesh((2, 4), ("data", "pipe"))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda p, t: _text_encoder("pipe").apply({"params": p}, t))(params, text)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_train_step_dp_x_pp_matches_dp():
    """Full CDDMSL train step with TPU.PIPELINE_AXIS='pipe' on a
    (data=4, pipe=2) mesh: the V2L mapper pipelines inside the jitted step
    and the metrics match pure 8-way DP on the same global batch."""
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from cddmsl_tpu.engine import TrainState, make_train_step
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.parallel import replicate, shard_batch
    from cddmsl_tpu.solver import build_lr_schedule, build_optimizer
    from cddmsl_tpu.utils.testing import materialize_params

    cfg = _flagship_cfg(tiny=True)
    model_dp = build_model(cfg)
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.PIPELINE_AXIS = "pipe"
    cfg2.freeze()
    model_pp = build_model(cfg2)

    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(8, 64, 96, g=4)
    params = materialize_params(
        lambda r, b: model_dp.init({"params": r}, b, r, method=model_dp.init_all), rng, batch
    )
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(cfg.SOLVER.CAPTION_BURNUP_ITERS + 1, jnp.int32))
    mk = lambda m: make_train_step(
        m, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg), donate=False,
    )
    step_rng = jax.random.PRNGKey(3)

    mesh_dp = create_mesh((8,), ("data",))
    with jax.sharding.set_mesh(mesh_dp):
        st = replicate(state, mesh_dp)
        b = shard_batch(batch, mesh_dp)
        _, metrics_dp = mk(model_dp)(st, b, step_rng)
        metrics_dp = jax.device_get(metrics_dp)

    mesh_pp = create_mesh((4, 2), ("data", "pipe"))
    with jax.sharding.set_mesh(mesh_pp):
        st = replicate(state, mesh_pp)
        b = shard_batch(batch, mesh_pp)
        _, metrics_pp = mk(model_pp)(st, b, step_rng)
        metrics_pp = jax.device_get(metrics_pp)

    for k, v in metrics_pp.items():
        assert np.isfinite(float(v)), (k, float(v))
        atol = 1e-3 if k == "kd_loss" else 2e-5
        np.testing.assert_allclose(
            float(v), float(metrics_dp[k]), rtol=2e-4, atol=atol, err_msg=k
        )
