"""Environment helpers (reference detectron2/utils/env.py:27,97).

The reference seeds torch/numpy/python RNGs and lets a custom module hook
into process setup via the DETECTRON2_ENV_MODULE env var. JAX RNG is
functional (explicit PRNG keys, no global stream), so `seed_all_rng` seeds
the host-side RNGs (python `random`, numpy — used by data augmentation and
samplers) and returns a `jax.random.PRNGKey` for the device-side streams.
"""

import importlib
import importlib.util
import logging
import os
import random
import sys
from datetime import datetime

import numpy as np

__all__ = ["seed_all_rng", "setup_environment", "setup_custom_environment"]

_ENV_SETUP_DONE = False


def seed_all_rng(seed=None):
    """Seed python/numpy host RNGs and return a jax PRNGKey.

    Reference detectron2/utils/env.py:27 (seeds torch/np/random; None
    derives a strong seed from pid+time+urandom). Returns the derived
    `jax.random.PRNGKey(seed)` so callers can thread it into jitted code.
    """
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
        logging.getLogger(__name__).info("Using a generated random seed %s", seed)
    seed = int(seed) % (2**31)
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)


def _import_file(module_name, file_path, make_importable=False):
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if make_importable:
        sys.modules[module_name] = module
    return module


def setup_environment():
    """Run libraries/env setup once; honors CDDMSL_ENV_MODULE (reference's
    DETECTRON2_ENV_MODULE hook, env.py:97-116)."""
    global _ENV_SETUP_DONE
    if _ENV_SETUP_DONE:
        return
    _ENV_SETUP_DONE = True
    custom_module_path = os.environ.get("CDDMSL_ENV_MODULE")
    if custom_module_path:
        setup_custom_environment(custom_module_path)


def setup_custom_environment(custom_module):
    """Load a module (path or importable name) and call its
    `setup_environment()` (reference env.py:119-133)."""
    if custom_module.endswith(".py"):
        module = _import_file("cddmsl_tpu.utils.env.custom_module", custom_module)
    else:
        module = importlib.import_module(custom_module)
    assert hasattr(module, "setup_environment") and callable(module.setup_environment), (
        "Custom environment module %s must define setup_environment()" % custom_module
    )
    module.setup_environment()
