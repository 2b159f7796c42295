"""Tests for the small-utils quartet: env / serialize / file_io / colormap
(reference detectron2/utils/{env,serialize,file_io,colormap}.py)."""

import os
import pickle
import random

import numpy as np
import pytest

from cddmsl_tpu.utils.colormap import colormap, random_color, random_colors
from cddmsl_tpu.utils.env import seed_all_rng, setup_custom_environment
from cddmsl_tpu.utils.file_io import PathManager
from cddmsl_tpu.utils.serialize import PicklableWrapper


def test_seed_all_rng_deterministic():
    key1 = seed_all_rng(42)
    np1, py1 = np.random.rand(3), random.random()
    key2 = seed_all_rng(42)
    np2, py2 = np.random.rand(3), random.random()
    assert np.allclose(np1, np2) and py1 == py2
    assert np.array_equal(np.asarray(key1), np.asarray(key2))


def test_seed_all_rng_none_generates():
    key = seed_all_rng(None)
    assert np.asarray(key).shape == (2,)


def test_setup_custom_environment(tmp_path):
    mod = tmp_path / "envmod.py"
    mod.write_text(
        "CALLED = []\n\ndef setup_environment():\n    CALLED.append(1)\n"
    )
    setup_custom_environment(str(mod))  # must find and call setup_environment


def test_picklable_wrapper_closure():
    offset = 10
    wrapped = PicklableWrapper(lambda x: x + offset)
    restored = pickle.loads(pickle.dumps(wrapped))
    assert restored(5) == 15
    # double-wrap unwraps
    assert PicklableWrapper(wrapped)._obj is wrapped._obj


def test_path_manager_local(tmp_path):
    p = str(tmp_path / "a.txt")
    with PathManager.open(p, "w") as f:
        f.write("hi")
    assert PathManager.exists(p) and PathManager.isfile(p)
    assert PathManager.ls(str(tmp_path)) == ["a.txt"]
    assert PathManager.copy(p, str(tmp_path / "b.txt"))
    assert not PathManager.copy(p, str(tmp_path / "b.txt"))  # no overwrite
    PathManager.rm(str(tmp_path / "b.txt"))
    assert not PathManager.exists(str(tmp_path / "b.txt"))


def test_path_manager_namespace():
    # cddmsl:// and detectron2:// resolve into the repo tree
    local = PathManager.get_local_path("cddmsl://configs")
    assert os.path.isdir(local) and local.endswith("configs")
    assert PathManager.get_local_path("detectron2://configs") == local
    assert PathManager.exists("cddmsl://configs")


def test_path_manager_http_cache_only(tmp_path, monkeypatch):
    monkeypatch.setenv("CDDMSL_CACHE", str(tmp_path))
    url = "https://example.com/weights.pkl"
    with pytest.raises(FileNotFoundError):
        PathManager.get_local_path(url)
    assert not PathManager.exists(url)
    (tmp_path / "weights.pkl").write_bytes(b"x")
    assert PathManager.get_local_path(url) == str(tmp_path / "weights.pkl")


def test_colormap_surface():
    c = colormap()
    assert c.shape == (74, 3) and c.min() >= 0 and c.max() <= 255
    rgb = colormap(rgb=True)
    assert np.allclose(rgb[:, ::-1], c)  # bgr default, reference signature
    small = colormap(rgb=True, maximum=1)
    assert small.max() <= 1.0
    assert random_color(rgb=True).shape == (3,)
    assert random_colors(5).shape == (5, 3)
    # distinct leading colors (palette property)
    assert len({tuple(np.round(x, 3)) for x in colormap(maximum=1)[:10]}) == 10
