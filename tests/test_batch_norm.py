"""SyncBatchNorm + PreciseBN (the round-1 parity table's one 'no':
reference layers/batch_norm.py NaiveSyncBatchNorm + hooks.py:397 PreciseBN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cddmsl_tpu.models.backbone.batch_norm import SyncBatchNorm, update_bn_stats


def test_bn_normalizes_and_tracks_stats():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(8, 4, 4, 3).astype(np.float32) * 2 + 5)
    bn = SyncBatchNorm(features=3, axis_name=None, momentum=0.5)
    vars0 = bn.init(jax.random.PRNGKey(0), x)
    out, mutated = bn.apply(vars0, x, mutable=["batch_stats"])
    o = np.asarray(out)
    np.testing.assert_allclose(o.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(o.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    # running stats moved toward the batch stats (momentum 0.5 from 0/1 init)
    rm = np.asarray(mutated["batch_stats"]["running_mean"])
    np.testing.assert_allclose(rm, 0.5 * np.asarray(x).mean(axis=(0, 1, 2)), rtol=1e-5)

    # eval mode uses the running stats (no batch dependence)
    vars1 = {"params": vars0["params"], "batch_stats": mutated["batch_stats"]}
    e1 = bn.apply(vars1, x[:2], train=False)
    e2 = bn.apply(vars1, x[2:4], train=False)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))  # different inputs
    # but the normalization constants are identical: same affine applied
    a = (np.asarray(e1)[0, 0, 0] - np.asarray(bn.apply(vars1, x[:2] * 0, train=False))[0, 0, 0])
    assert np.isfinite(a).all()


def test_sync_bn_cross_device_stats():
    """Across the 8-device mesh the batch statistics are pmean'd — per-shard
    outputs match a single-device BN over the GLOBAL batch."""
    import jax

    devices = jax.devices()
    n = min(8, len(devices))
    r = np.random.RandomState(1)
    x = r.randn(n * 2, 4, 4, 3).astype(np.float32) * 3 + 1

    bn = SyncBatchNorm(features=3, axis_name="data")
    vars0 = SyncBatchNorm(features=3, axis_name=None).init(jax.random.PRNGKey(0), jnp.asarray(x))

    def shard_fn(xs):
        out, _ = bn.apply(vars0, xs, mutable=["batch_stats"])
        return out

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(devices[:n]), ("data",))
    f = jax.jit(shard_map(shard_fn, mesh=mesh, in_specs=P("data"), out_specs=P("data")))
    got = np.asarray(f(jnp.asarray(x)))

    ref_bn = SyncBatchNorm(features=3, axis_name=None)
    want, _ = ref_bn.apply(vars0, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_precise_bn_recovers_true_stats():
    r = np.random.RandomState(2)
    bn = SyncBatchNorm(features=3, axis_name=None, momentum=0.9)
    x0 = jnp.asarray(r.randn(4, 2, 2, 3).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x0)

    batches = [jnp.asarray(r.randn(16, 2, 2, 3).astype(np.float32) * 2 + 3) for _ in range(8)]

    def apply_fn(v, b):
        return bn.apply(v, b, mutable=["batch_stats"])

    new_vars = update_bn_stats(apply_fn, variables, batches, momentum=0.9)
    est_mean = np.asarray(new_vars["batch_stats"]["running_mean"])
    true_mean = np.mean([np.asarray(b).mean(axis=(0, 1, 2)) for b in batches], axis=0)
    np.testing.assert_allclose(est_mean, true_mean, atol=1e-4)
