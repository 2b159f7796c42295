"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 'Implication for the rebuild')."""

import os

# Unit tests must run on a deterministic local CPU (8 virtual devices for
# mesh tests). The axon sitecustomize force-registers the remote TPU and
# overrides the JAX_PLATFORMS env var, so the config must be set through
# jax.config AFTER import — env manipulation alone silently leaves tests
# running over the TPU tunnel (every op a network round-trip).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

# persistent compile cache: XLA CPU compiles dominate suite runtime otherwise.
# Skip XLA-level AOT artifacts: their host-feature stamps (+prefer-no-gather
# etc.) fail to reload on some CPUs, so the cache would never hit and spam
# cpu_aot_loader errors (the round-1 MULTICHIP failure mode).
# The cache dir is FINGERPRINTED by the host's CPU feature set: /tmp persists
# across sessions but sessions hop machines, and entries compiled on a
# richer-ISA host mis-load here (cpu_aot_loader machine-mismatch warnings;
# in the 2-process gloo tests a poisoned rank dies mid-step and the peer
# times out at the next collective clique — the round-5 test_multihost
# failure mode).
def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
        return hashlib.md5(flags.encode()).hexdigest()[:10]
    except Exception:
        return "generic"


jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_cddmsl_tests_{_cpu_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")


@pytest.fixture
def rng():
    return np.random.RandomState(42)


# Bound the suite's resident memory: one pytest process accumulates every
# compiled XLA executable (plus their buffers), reaching ~25 GB by
# mid-suite — large enough to trigger transparent-huge-page compaction
# storms (khugepaged pinning the CPU at 95% system time, observed as a
# multi-hour stall around test #115 on a 1-core host). Clearing the jit
# caches at module boundaries keeps RSS flat; re-used programs reload from
# the persistent compile cache in seconds.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_after_module():
    yield
    # Abandoned train loaders are INFINITE generators whose prefetch threads
    # keep producing (image decode + device_put) after their module ends; on
    # a 1-core host they convoy with the next module's dispatch — observed
    # as a multi-hour stall (docs/STATUS.md ops note). Stop them, then drop
    # the accumulated executables.
    from cddmsl_tpu.data.build import stop_all_prefetchers

    stop_all_prefetchers()
    jax.clear_caches()


def pytest_collection_modifyitems(session, config, items):
    """Run the 2-process gloo integration tests FIRST.

    test_multihost passes deterministically when pytest targets the module
    (directly, or alongside other modules), but inside a full `pytest
    tests/` run one worker rank falls >30 s behind mid-step — gloo's
    hardcoded clique-creation window — and dies with 'GetKeyValue() timed
    out' even on a warm compile cache and with this module first. The
    per-rank executables and the machinery (compile-barrier + per-step
    drain, parallel/multihost.py) are validated by the standalone runs;
    the full-run interaction (full-collection imports are the remaining
    suspect — parent RSS and khugepaged storms were measured and ruled
    out at 111 GB free) is an emulation-environment artifact of the
    shared 1-core host, still under investigation (docs/STATUS.md round-5
    ops note). Running the module first minimizes the parent's footprint
    either way. Alphabetical order otherwise.
    """
    mh = [it for it in items if "test_multihost" in it.nodeid]
    if mh:
        rest = [it for it in items if "test_multihost" not in it.nodeid]
        items[:] = mh + rest
