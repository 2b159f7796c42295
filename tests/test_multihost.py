"""Multi-host integration test (r3 VERDICT next-round #1).

Spawns TWO real `jax.distributed` processes over local TCP (4 virtual CPU
devices each, gloo cross-process collectives) running the full
DefaultTrainer on the rcnn_instant_test quick schedule — process-blocked
loader rows, make_array_from_process_local_data batch assembly, collective
orbax checkpointing, rank-0-only writers, sharded eval with
process_allgather fetch — and compares:

  * rank 0 vs rank 1: losses and eval results identical (same SPMD program)
  * 2-process DP(4)x2 vs single-process DP(8) (run in THIS pytest process,
    which owns 8 virtual devices): the global batch is constructed to be
    bit-identical (contiguous row-blocks of the same global stream), so the
    losses must agree to float tolerance (the only difference is gloo vs
    in-process collective reduction order).

Reference surface being replaced: detectron2/engine/launch.py:27-125
multi-machine launch + samplers/distributed_sampler.py per-rank sharding.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(rank, nproc, port, fixture_root, outdir):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, os.path.join(_HERE, "_multihost_worker.py"),
         str(rank), str(nproc), str(port), fixture_root, outdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )


def _run_workers(fixture_root, outdir):
    port = _free_port()
    procs = [_spawn(r, 2, port, fixture_root, outdir) for r in (1, 0)]
    deadline = time.time() + 1500  # cold CPU compile x2 on a shared core
    outs = [None, None]
    try:
        for p in procs:
            remaining = max(10, deadline - time.time())
            try:
                out, _ = p.communicate(timeout=remaining)
            except subprocess.TimeoutExpired:
                # jax.distributed installs a SIGTERM handler (preemption
                # notifier) that can swallow TERM — use SIGKILL
                for q in procs:
                    if q.poll() is None:
                        q.send_signal(signal.SIGKILL)
                out, _ = p.communicate(timeout=30)
            outs[0 if "rank 0" in (out or "") else 1] = out
    finally:
        for q in procs:
            if q.poll() is None:
                q.send_signal(signal.SIGKILL)
    return outs


@pytest.fixture(scope="module")
def twoproc_results(tmp_path_factory):
    fixture_root = str(tmp_path_factory.mktemp("mh_fixture"))
    outs = None
    for attempt in range(3):
        # Multiple attempts: gloo collective-context creation gives late
        # ranks a hardcoded 30 s window, so on a 1-core host a cold-cache
        # compile phase can still kill attempt 1. Its compiles persist in
        # the cache, making later attempts warm (programs load in seconds,
        # skew ~0). A third attempt absorbs the residual full-suite-only
        # host-contention flake (docs/STATUS.md round-5 ops note).
        outdir = str(tmp_path_factory.mktemp(f"mh_out{attempt}"))
        outs = _run_workers(fixture_root, outdir)
        if all(
            os.path.exists(os.path.join(outdir, f"result_rank{r}.json")) for r in (0, 1)
        ):
            break
        time.sleep(10)  # let straggler sockets/threads drain before retrying
    results = {}
    for r in (0, 1):
        path = os.path.join(outdir, f"result_rank{r}.json")
        if not os.path.exists(path):
            tail = "\n".join((outs[0] or "").splitlines()[-30:] + (outs[1] or "").splitlines()[-30:])
            pytest.fail(f"rank {r} produced no result file; worker tails:\n{tail}")
        with open(path) as f:
            results[r] = json.load(f)
    return results, fixture_root


def _single_process_reference(fixture_root, outdir):
    """The DP(8) single-process run of the identical config, in this pytest
    process (which owns the 8-device CPU platform)."""
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    register_synthetic_quick(fixture_root)
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(_REPO, "configs/quick_schedules/rcnn_instant_test.yaml"))
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.OUTPUT_DIR = outdir
    cfg.TPU.FAST_INIT = True  # must match the workers for param equality
    cfg.freeze()
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    results = trainer.train()
    losses = {k: h.latest() for k, h in trainer.storage.histories().items() if "loss" in k}
    evals = {ds: dict(res.get("bbox", {})) for ds, res in results.items()}
    return losses, evals


def test_ranks_agree(twoproc_results):
    """Both processes execute ONE SPMD program: identical metrics/results."""
    results, _ = twoproc_results
    assert results[0]["losses"].keys() == results[1]["losses"].keys()
    for k in results[0]["losses"]:
        assert results[0]["losses"][k] == pytest.approx(results[1]["losses"][k], abs=0.0), k
    assert results[0]["results"] == results[1]["results"]


def test_two_host_matches_single_host(twoproc_results, tmp_path):
    """DP(4)x2-host == DP(8)-single-host: same global batches, same model,
    same losses (up to collective reduction order) and same eval metrics."""
    results, fixture_root = twoproc_results
    want_losses, want_evals = _single_process_reference(fixture_root, str(tmp_path / "sp_out"))
    got_losses = results[0]["losses"]
    assert set(got_losses) == set(want_losses)
    for k in want_losses:
        np.testing.assert_allclose(got_losses[k], want_losses[k], rtol=1e-5, atol=1e-6, err_msg=k)
    got_evals = results[0]["results"]
    for ds, m in want_evals.items():
        for metric, v in m.items():
            np.testing.assert_allclose(
                got_evals[ds][metric], v, rtol=1e-4, atol=1e-4, err_msg=f"{ds}/{metric}"
            )
