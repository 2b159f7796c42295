"""Async checkpointing + keep-last-K GC (checkpoint/checkpointer.py).

The reference saves synchronously on the training thread (fvcore
PeriodicCheckpointer); TPU.ASYNC_CHECKPOINT moves orbax serialization + disk
IO to a background thread. SOLVER.CHECKPOINT_MAX_TO_KEEP is fvcore's
max_to_keep: only the newest K periodic checkpoints stay on disk."""

import os

import jax.numpy as jnp
import numpy as np

from cddmsl_tpu.checkpoint import DetectionCheckpointer


def _state(seed):
    r = np.random.RandomState(seed)
    return {
        "params": {"w": jnp.asarray(r.rand(8, 8), jnp.float32), "b": jnp.asarray(r.rand(8), jnp.float32)},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_async_save_restore_roundtrip(tmp_path):
    ck = DetectionCheckpointer(str(tmp_path), async_save=True)
    s1 = _state(1)
    ck.save("model_0000001", s1)
    # restore while the save may still be in flight: load_native must drain
    restored = ck.load_native(ck.get_checkpoint_file(), _state(0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.asarray(s1["params"]["w"]))
    assert int(restored["step"]) == 1
    ck.wait_until_finished()  # idempotent


def test_async_matches_sync(tmp_path):
    a = DetectionCheckpointer(str(tmp_path / "a"), async_save=False)
    b = DetectionCheckpointer(str(tmp_path / "b"), async_save=True)
    s = _state(3)
    a.save("m", s)
    b.save("m", s)
    b.wait_until_finished()
    ra = a.load_native(str(tmp_path / "a" / "m"), _state(0))
    rb = b.load_native(str(tmp_path / "b" / "m"), _state(0))
    np.testing.assert_allclose(np.asarray(ra["params"]["w"]), np.asarray(rb["params"]["w"]))


def test_max_to_keep_gc(tmp_path):
    ck = DetectionCheckpointer(str(tmp_path), max_to_keep=2)
    for i in range(5):
        ck.save(f"model_{i:07d}", _state(i))
    ck.save("model_final", _state(99))
    dirs = sorted(d for d in os.listdir(tmp_path) if d.startswith("model"))
    # newest 2 periodic + the protected final survive
    assert dirs == ["model_0000003", "model_0000004", "model_final"]
    # the marker still points at a live checkpoint
    assert os.path.isdir(ck.get_checkpoint_file())


def test_gc_never_deletes_resume_target(tmp_path):
    ck = DetectionCheckpointer(str(tmp_path), max_to_keep=1)
    ck.save("model_0000001", _state(1))
    # marker points at model_0000001; saving 2 more must not delete it
    # until a newer marker supersedes it
    ck.save("model_0000002", _state(2))
    assert os.path.isdir(ck.get_checkpoint_file())
    restored = ck.load_native(ck.get_checkpoint_file(), _state(0))
    assert int(restored["step"]) == 2
