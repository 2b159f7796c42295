"""Flagship-shape multi-device LOWERING check (VERDICT round-2 item 4).

The tiny-network dryrun validates collective semantics by executing; this
test validates that the FULL bf16 RN50 CDDMSL train step STAGES (jax
lower(), no compile, no execution) against the 8-virtual-device mesh at the
real 800x1344 pad-bucket shapes — catching sharding/layout errors at
production shapes that the tiny dryrun cannot see. Inputs are abstract
jax.ShapeDtypeStructs carrying NamedShardings, so no RN50 params or 100MB
image batches are ever materialized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch


@pytest.mark.slow
def test_flagship_bf16_rn50_train_step_lowers_on_mesh():
    from cddmsl_tpu.engine import TrainState, make_train_step
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.parallel import batch_sharding, create_mesh, replicated
    from cddmsl_tpu.solver import build_lr_schedule, build_optimizer

    cfg = _flagship_cfg(tiny=False)
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT_BACKBONE = True
    model = build_model(cfg)

    B, H, W = 8, 800, 1344
    mesh = create_mesh((8,), ("data",))
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    # abstract param/optimizer shapes (eval_shape executes nothing)
    batch_shapes = jax.eval_shape(lambda: _synthetic_batch(B, H, W, g=100))
    rng = jax.random.PRNGKey(0)
    param_shapes = jax.eval_shape(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch_shapes
    )
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(param_shapes))
    assert n_params > 100e6, f"expected full RN50 scale, got {n_params/1e6:.1f}M params"

    optimizer = build_optimizer(cfg, param_shapes)
    state_shapes = jax.eval_shape(lambda p: TrainState.create(p, optimizer), param_shapes)

    def _abstract(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            if hasattr(x, "shape")
            else x,
            tree,
        )

    state_in = _abstract(state_shapes, rep)
    batch_in = _abstract(batch_shapes, shard)
    rng_in = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    step_fn = make_train_step(
        model,
        build_optimizer(cfg, param_shapes),
        enable_caption=True,
        kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg),
        donate=False,
    )
    with jax.sharding.set_mesh(mesh):
        lowered = step_fn.lower(state_in, batch_in, rng_in)
    # staging succeeded at flagship shapes; sanity-check the module is an
    # 8-partition SPMD program over the data mesh (the Shardy partitioner
    # stages sharding annotations; explicit collectives appear only after
    # compile-time SPMD partitioning)
    text = lowered.as_text()
    assert "num_partitions = 8" in text, "not an 8-partition SPMD program"
    assert "sdy.mesh" in text or "mhlo.sharding" in text, "no mesh/sharding annotations staged"
