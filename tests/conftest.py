"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 'Implication for the rebuild')."""

import os

# force, not setdefault: the shell exports JAX_PLATFORMS=axon (real TPU) and
# unit tests must be deterministic CPU
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# persistent compile cache: XLA CPU compiles dominate suite runtime otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cddmsl_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.RandomState(42)
