import json
import os

import numpy as np
import pytest

from cddmsl_tpu.config.lazy import LazyCall, instantiate, locate
from cddmsl_tpu.structures.tsv_file import TSVFile, generate_lineidx
from cddmsl_tpu.utils.events import EventStorage, HistoryBuffer, JSONWriter, get_event_storage
from cddmsl_tpu.utils.registry import Registry


def test_registry():
    r = Registry("TEST")

    @r.register()
    def thing():
        return 42

    assert r.get("thing")() == 42
    assert "thing" in r
    with pytest.raises(KeyError):
        r.get("missing")
    with pytest.raises(ValueError):
        r.register(thing)


def test_event_storage_and_json_writer(tmp_path):
    path = str(tmp_path / "metrics.json")
    writer = JSONWriter(path)
    with EventStorage(0) as storage:
        assert get_event_storage() is storage
        for i in range(5):
            storage.put_scalar("loss", 10.0 - i)
            storage.put_scalar("lr", 0.1, smoothing_hint=False)
            writer.write(storage)
            storage.step()
    writer.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 5
    assert lines[-1]["iteration"] == 4
    assert lines[-1]["lr"] == 0.1
    # median smoothing
    assert lines[-1]["loss"] == np.median([10, 9, 8, 7, 6])


def test_history_buffer():
    h = HistoryBuffer(window=3)
    for i, v in enumerate([1.0, 2.0, 30.0]):
        h.update(v, i)
    assert h.latest() == 30.0
    assert h.median() == 2.0
    assert h.global_avg() == pytest.approx(11.0)


def test_lazycall_instantiate():
    cfg = {"model": LazyCall(dict)(a=1, b=LazyCall(list)()), "x": [LazyCall(dict)(c=3)]}
    out = instantiate(cfg)
    assert out["model"] == {"a": 1, "b": []}
    assert out["x"][0] == {"c": 3}


def test_locate():
    fn = locate("numpy.mean")
    assert fn is np.mean


def test_lazyconfig_load_and_overrides(tmp_path):
    from cddmsl_tpu.config.lazy import LazyConfig

    p = tmp_path / "cfg.py"
    p.write_text(
        "from cddmsl_tpu.config.lazy import LazyCall\n"
        "train = dict(lr=0.1, steps=100)\n"
        "model = LazyCall(dict)(depth=50)\n"
    )
    cfg = LazyConfig.load(str(p))
    assert cfg.train["lr"] == 0.1
    LazyConfig.apply_overrides(cfg, ["train.lr=0.5", "model.depth=101"])
    assert cfg.train["lr"] == 0.5
    assert instantiate(cfg.model) == {"depth": 101}


def test_tsv_file(tmp_path):
    p = str(tmp_path / "data.tsv")
    with open(p, "w") as f:
        f.write("img1\tcaption one\nimg2\tcaption two\nimg3\tcaption three\n")
    tsv = TSVFile(p)
    assert len(tsv) == 3
    assert tsv[1] == ["img2", "caption two"]
    assert tsv[0] == ["img1", "caption one"]
    assert tsv[2][1] == "caption three"
    assert os.path.exists(str(tmp_path / "data.lineidx"))


def test_parameter_count_table():
    from cddmsl_tpu.utils.analysis import parameter_count, parameter_count_table

    params = {"a": {"w": np.zeros((10, 10))}, "b": {"w": np.zeros((5,))}}
    assert parameter_count(params) == 105
    table = parameter_count_table(params, max_depth=1)
    assert "a" in table and "TOTAL" in table


def test_rampups():
    from cddmsl_tpu.data.transforms import exp_rampup, linear_rampup

    assert exp_rampup(0, 100) == pytest.approx(np.exp(-5))
    assert exp_rampup(100, 100) == 1.0
    assert linear_rampup(50, 100) == 0.5


def test_clip_img_txt_tsv_dataset(tmp_path):
    import base64
    import io

    from PIL import Image

    from cddmsl_tpu.data.clip_datasets import CLIPImgTxtPairTSVDataset

    img_tsv = str(tmp_path / "img.tsv")
    txt_tsv = str(tmp_path / "txt.tsv")
    with open(img_tsv, "w") as fi, open(txt_tsv, "w") as ft:
        for i in range(3):
            buf = io.BytesIO()
            Image.new("RGB", (8 + i, 10), color=(i * 10, 0, 0)).save(buf, format="JPEG")
            fi.write(f"k{i}\t{base64.b64encode(buf.getvalue()).decode()}\n")
            ft.write(f'k{i}\t{{"captions": ["caption {i}"]}}\n')
    ds = CLIPImgTxtPairTSVDataset([img_tsv], [txt_tsv])
    assert len(ds) == 3
    img, cap = ds[1]
    assert img.shape == (10, 9, 3)
    assert cap == "caption 1"
    batch_imgs, caps = next(ds.batches(2, image_size=16))
    assert batch_imgs.shape == (2, 16, 16, 3)
    assert len(caps) == 2


def test_stablehlo_export_roundtrip_tiny_model(tmp_path):
    """export/api.py: serialize a tiny jitted inference, reload, run
    (the deploy CLI's round-trip in miniature)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cddmsl_tpu.export import export_inference, load_exported

    def fn(w, x):
        return jnp.tanh(x @ w)

    w = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
    x = jnp.ones((2, 4), jnp.float32)
    out_dir = export_inference(fn, (w, x), str(tmp_path / "export"))
    call = load_exported(out_dir)
    np.testing.assert_allclose(np.asarray(call(w, x)), np.asarray(fn(w, x)), rtol=1e-6)
