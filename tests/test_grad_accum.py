"""In-step gradient accumulation (SOLVER.ACCUM_STEPS, engine/train_loop.py).

No reference counterpart (DDP scales batch by adding GPUs); here a lax.scan
over microbatches keeps activation memory per-microbatch while the optimizer
sees the full-batch mean gradient. Verified definitionally: the accumulated
step must equal hand-computing grads per microbatch (same per-microbatch RNG
split), averaging, and applying ONE optimizer update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.engine import TrainState, make_train_step
from cddmsl_tpu.models import build_model
from cddmsl_tpu.solver import build_lr_schedule, build_optimizer


@pytest.fixture(scope="module")
def setup():
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
    return cfg, model, optimizer, state, batch


def _max_rel_diff(a, b):
    diffs = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) / (jnp.abs(y) + 1e-8))), a, b
    )
    return max(jax.tree_util.tree_leaves(diffs) or [0.0])


def test_accum_matches_manual_average(setup):
    """accum_steps=2 == mean of per-microbatch grads + one optimizer update."""
    cfg, model, optimizer, state, batch = setup
    rng = jax.random.PRNGKey(7)

    step2 = make_train_step(
        model, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg), donate=False, accum_steps=2,
    )
    new_state, metrics = step2(state, batch, rng)

    # manual: the same microbatch split + rng split the scan uses
    def loss_fn(params, mb, r):
        losses = model.apply(
            params, mb, r, state.step > cfg.SOLVER.CAPTION_BURNUP_ITERS,
            True, True, method=model.cddmsl_losses,
        )
        return jnp.sum(jnp.stack([v for v in losses.values()])), losses

    rngs = jax.random.split(rng, 2)
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((2, x.shape[0] // 2) + x.shape[1:]), batch
    )
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    acc = None
    totals = []
    for i in range(2):
        mb = jax.tree_util.tree_map(lambda x: x[i], micro)
        (t, _losses), g = grad_fn(state.params, mb, rngs[i])
        totals.append(float(t))
        acc = g if acc is None else jax.tree_util.tree_map(jnp.add, acc, g)
    grads = jax.tree_util.tree_map(lambda x: x / 2.0, acc)
    updates, _ = jax.jit(optimizer.update)(grads, state.opt_state, state.params)
    import optax

    expect_params = optax.apply_updates(state.params, updates)

    assert np.isclose(float(metrics["total_loss"]), np.mean(totals), rtol=1e-5)
    assert _max_rel_diff(new_state.params, expect_params) < 1e-4
    assert int(new_state.step) == int(state.step) + 1  # one LOGICAL iteration


def test_accum_rejects_indivisible_batch(setup):
    cfg, model, optimizer, state, batch = setup
    step3 = make_train_step(
        model, optimizer, caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        donate=False, accum_steps=3,
    )
    with pytest.raises(Exception):
        jax.block_until_ready(step3(state, batch, jax.random.PRNGKey(0)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device conftest mesh")
def test_accum_under_data_mesh(setup):
    """accum=2 under the 8-device 'data' mesh == accum=2 single-program:
    per-microbatch grads are still psum'd over the data axis correctly."""
    cfg, model, optimizer, state, batch = setup
    from cddmsl_tpu.parallel import create_mesh, replicate, shard_batch

    rng = jax.random.PRNGKey(11)
    step2 = make_train_step(
        model, optimizer, enable_caption=True, kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS, donate=False,
        accum_steps=2,
    )
    ref_state, ref_metrics = step2(state, batch, rng)

    mesh = create_mesh((8,), ("data",))
    sh_state = replicate(state, mesh)
    sh_batch = shard_batch(batch, mesh)
    mesh_state, mesh_metrics = step2(sh_state, sh_batch, rng)
    assert np.isclose(
        float(mesh_metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-5
    )
    assert _max_rel_diff(jax.device_get(mesh_state.params), jax.device_get(ref_state.params)) < 1e-4
