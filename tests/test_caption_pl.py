"""Pseudo-label caption branches (VERDICT round-1 item 10): caption_pl_img /
caption_pl_region wired as a separate jitted step (reference rcnn.py:556-591)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _flagship_cfg, _synthetic_batch
from cddmsl_tpu.engine import TrainState, make_caption_pl_step
from cddmsl_tpu.models import build_model
from cddmsl_tpu.models.caption import ClipCaptionModel
from cddmsl_tpu.solver import build_optimizer
from cddmsl_tpu.utils.testing import materialize_params


@pytest.fixture(scope="module")
def pl_setup():
    cfg = _flagship_cfg(tiny=True)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(2, 64, 96, g=4)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    # tiny ClipCap model: mapper + tiny GPT-2
    from cddmsl_tpu.models.gpt2 import GPT2Config

    cap = ClipCaptionModel(
        prefix_length=4, clip_length=4, dim_clip=cfg.TPU.EMBED_DIM,
        gpt_config=GPT2Config(vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=2),
    )
    cap_params = materialize_params(
        lambda r: cap.init(r, jnp.zeros((1, 6), jnp.int32), jnp.zeros((1, cfg.TPU.EMBED_DIM))), rng
    )
    optimizer = build_optimizer(cfg, params)
    return cfg, model, params, batch, cap, cap_params, optimizer


@pytest.mark.parametrize("level", ["img", "region"])
def test_caption_pl_step(pl_setup, level):
    cfg, model, params, batch, cap, cap_params, optimizer = pl_setup
    step = make_caption_pl_step(model, cap, cap_params, optimizer, level=level, max_len=6)
    state = TrainState.create(params, optimizer)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    key = "token-pl_loss" if level == "img" else "token-pl-region_loss"
    assert key in metrics and np.isfinite(float(metrics[key]))
    # backbone moved (gradient flowed through the trgt prefix)
    p0 = jax.device_get(params)["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    p1 = jax.device_get(new_state.params)["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    assert not np.array_equal(p0, p1)
