#!/usr/bin/env python
"""Build the C++ PJRT deploy runner (tools/deploy/pjrt_runner.cpp).

The reference ships a CMake C++ deploy example (tools/deploy/CMakeLists.txt
+ torchscript_mask_rcnn.cpp built against libtorch); the TPU-native
equivalent needs only the PJRT C API header, which the installed
tensorflow (or any XLA source tree on CDDMSL_PJRT_INCLUDE) provides.

  python tools/deploy/build_runner.py          # -> tools/deploy/pjrt_runner
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def find_pjrt_include():
    """Directory such that tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h
    resolves — env override first, then the installed tensorflow wheel."""
    cand = os.environ.get("CDDMSL_PJRT_INCLUDE")
    rel = "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"
    if cand and os.path.exists(os.path.join(cand, rel)):
        return cand
    import importlib.util

    spec = importlib.util.find_spec("tensorflow")
    if spec and spec.origin:
        inc = os.path.join(os.path.dirname(spec.origin), "include")
        if os.path.exists(os.path.join(inc, rel)):
            return inc
    return None


def build(out: str = None) -> str:
    inc = find_pjrt_include()
    if inc is None:
        raise RuntimeError(
            "PJRT C API header not found; set CDDMSL_PJRT_INCLUDE to a "
            "directory containing tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"
        )
    out = out or os.path.join(HERE, "pjrt_runner")
    src = os.path.join(HERE, "pjrt_runner.cpp")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{inc}", src, "-o", out, "-ldl"],
        check=True,
    )
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
