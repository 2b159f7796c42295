"""Multi-host integration worker (spawned by tests/test_multihost.py).

One process per "host": 4 virtual CPU devices each, joined into an 8-device
global mesh via `launch()` (engine/defaults.py -> parallel/multihost.py ->
jax.distributed over local TCP + gloo CPU collectives). Trains the
rcnn_instant_test quick schedule for a few iterations through the REAL
DefaultTrainer (process-blocked loader rows, make_array_from_process_local_data
batch assembly, rank-0-only writers/checkpoints) and dumps the final loss
metrics + eval results to JSON for the parent to compare against the
single-process DP(8) run.

Usage: python _multihost_worker.py RANK NPROC PORT FIXTURE_ROOT OUTDIR
"""

import json
import os
import sys


def main():
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    fixture_root, outdir = sys.argv[4], sys.argv[5]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=4").strip()
    if "concurrency_optimized" not in flags:
        # MANDATORY for multi-process CPU: the concurrency-optimized
        # scheduler launches independent collectives in divergent orders
        # across processes, so gloo clique rendezvous keys collide and the
        # context init deadlocks (same failure mode parallel/fsdp.py warns
        # about for single-process virtual devices)
        flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # DEDICATED persistent cache: the cache key does NOT cover XLA_FLAGS, and
    # these workers REQUIRE executables compiled with the deterministic
    # scheduler flag above (the racy collective launch order is baked into
    # the executable) — sharing the suite's dir can resurrect poisoned
    # pre-flag entries and deadlock gloo clique rendezvous.
    # CPU-fingerprinted like conftest's: entries compiled by a previous
    # session on a richer-ISA machine mis-load here and kill one rank
    # mid-step, which the peer observes as a 30 s gloo clique timeout
    # (round-5 failure mode — see tests/conftest.py; inlined because
    # importing conftest would run its 8-device assertions)
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            fp = hashlib.md5(
                next(l for l in f if l.startswith("flags")).encode()
            ).hexdigest()[:10]
    except Exception:
        fp = "generic"
    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_cddmsl_mh_{fp}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from cddmsl_tpu.engine.defaults import DefaultTrainer, default_setup, launch

    def run():
        assert jax.process_count() == nproc, jax.process_count()
        assert jax.device_count() == nproc * 4, jax.device_count()

        from cddmsl_tpu.config import get_cfg
        from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick

        register_synthetic_quick(fixture_root)
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(repo, "configs/quick_schedules/rcnn_instant_test.yaml"))
        cfg.SOLVER.MAX_ITER = 4
        cfg.SOLVER.CHECKPOINT_PERIOD = 2  # exercise the collective periodic save
        cfg.OUTPUT_DIR = os.path.join(outdir, "shared_output")
        # deterministic structure-only params (identical across processes AND
        # vs the single-process reference); also kills the ~90 s real-init
        # skew that would overrun gloo's 30 s clique-init window on 1 core
        cfg.TPU.FAST_INIT = True
        cfg.freeze()
        default_setup(cfg)

        trainer = DefaultTrainer(cfg)
        trainer.resume_or_load(resume=False)
        results = trainer.train()

        losses = {
            k: h.latest() for k, h in trainer.storage.histories().items() if "loss" in k
        }
        payload = {
            "rank": rank,
            "losses": losses,
            "results": {ds: dict(res.get("bbox", {})) for ds, res in results.items()},
        }
        with open(os.path.join(outdir, f"result_rank{rank}.json"), "w") as f:
            json.dump(payload, f, indent=1)
        print(f"[rank {rank}] done", flush=True)

    launch(
        run,
        num_machines=nproc,
        machine_rank=rank,
        dist_url=f"tcp://localhost:{port}",
        args=(),
    )


if __name__ == "__main__":
    main()
