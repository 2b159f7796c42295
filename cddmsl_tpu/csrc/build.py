"""On-demand build + ctypes loading of the native helpers (the reference
ships csrc/ CUDA/C++ built by setup.py; here a small g++ -O3 shared object
loaded with ctypes, with graceful fallback when no toolchain exists)."""

import ctypes
import functools
import logging
import os
import subprocess
import tempfile

logger = logging.getLogger(__name__)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


@functools.lru_cache()
def load_native(name: str = "cocoeval"):
    """Compile (if needed) and load csrc/<name>.cpp; returns the CDLL or
    None when compilation is unavailable."""
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    so = os.path.join(_SRC_DIR, f"lib{name}.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True,
                capture_output=True,
            )
            logger.info("built native %s", so)
        except Exception as e:
            logger.warning("native build of %s failed (%s); using numpy fallback", name, e)
            return None
    try:
        return ctypes.CDLL(so)
    except OSError as e:
        logger.warning("failed to load %s (%s)", so, e)
        return None
