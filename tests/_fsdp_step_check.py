"""Subprocess body for tests/test_fsdp.py::test_fsdp_step_matches_dp.

Runs the FULL CDDMSL train step with ZeRO-3/FSDP-sharded state on the
8-virtual-CPU-device mesh and compares its metrics against the pure-DP
metrics computed by the parent test (passed as a JSON file).

Why a subprocess: the concurrency-optimized XLA:CPU HLO scheduler (the
default, and the right one for the rest of the suite — it compiles ~8x
faster) lets the thunk executor launch independent collectives in divergent
orders across the virtual devices. FSDP's per-parameter all-gathers are
exactly such independent collectives, and on a small host the rendezvous
threads starve each other and XLA aborts (observed: 7 devices blocked in
all-reduce op#1 vs 1 in all-gather op#452). The memory-optimized scheduler
serializes the thunk graph so collective order is deterministic — but it
must be set through XLA_FLAGS before jax initializes, hence this isolated
process. CPU-emulation-only concern: TPU executes collectives in program
order.

Usage: python _fsdp_step_check.py <expected_metrics.json>
Prints FSDP_CHECK_OK on success.
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
for needed in (
    "--xla_force_host_platform_device_count=8",
    "--xla_cpu_enable_concurrency_optimized_scheduler=false",
):
    if needed.split("=")[0] not in flags:
        flags = (flags + " " + needed).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# share the suite's persistent compile cache (keyed by flags, so this
# process' entries don't collide with the fast-scheduler ones)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cddmsl_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import jax.numpy as jnp
import numpy as np


def main():
    with open(sys.argv[1]) as f:
        expected = json.load(f)

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from cddmsl_tpu.engine import TrainState, make_train_step
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.parallel import create_mesh, fsdp_shardings, shard_batch
    from cddmsl_tpu.solver import build_lr_schedule, build_optimizer
    from cddmsl_tpu.utils.testing import materialize_params

    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(8, 64, 96, g=4)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    state = state.replace(step=jnp.asarray(cfg.SOLVER.CAPTION_BURNUP_ITERS + 1, jnp.int32))

    mesh = create_mesh((8,), ("data",))
    shardings = fsdp_shardings(state, mesh)
    fsdp_step = make_train_step(
        model,
        optimizer,
        enable_caption=True,
        kd_regularization=True,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg),
        donate=False,
        state_shardings=shardings,
    )
    with jax.sharding.set_mesh(mesh):
        st = jax.device_put(state, shardings)
        b = shard_batch(batch, mesh)
        new_state, metrics = fsdp_step(st, b, jax.random.PRNGKey(3))
        metrics = jax.device_get(metrics)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
        # kd_loss: catastrophic-cancellation quantity, wobbles with mesh
        # reduction order alone (control in test_tensor_parallel.py)
        atol = 1e-3 if k == "kd_loss" else 2e-5
        np.testing.assert_allclose(
            float(v), float(expected[k]), rtol=2e-4, atol=atol, err_msg=k
        )

    # updated params keep their FSDP shards (the out_shardings pin — without
    # it XLA materializes the updated params replicated)
    flat_new = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(lambda x: x.sharding, new_state.params)
    )[0]
    flat_want = jax.tree_util.tree_flatten_with_path(shardings.params)[0]
    n_sharded = 0
    for (kp, s_new), (_, s_want) in zip(flat_new, flat_want):
        if any(ax == "data" for ax in s_want.spec):
            assert s_new.spec == s_want.spec, kp
            n_sharded += 1
    assert n_sharded > 10, "expected the bulk of the params to be sharded"

    print("FSDP_CHECK_OK")


if __name__ == "__main__":
    main()
