"""Every tools/ CLI must at least parse and import its lazy deps (rot guard)."""

import glob
import importlib.util
import os
import sys

import pytest

TOOLS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "tools", "**", "*.py"), recursive=True))


@pytest.mark.parametrize("path", TOOLS, ids=[os.path.basename(p) for p in TOOLS])
def test_tool_compiles(path):
    with open(path) as f:
        src = f.read()
    compile(src, path, "exec")  # syntax
    # import without running main (every tool guards with __main__)
    spec = importlib.util.spec_from_file_location("_tool_" + os.path.basename(path)[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = [path]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
