"""RegionCLIP pretraining loop (VERDICT round-1 item 6): lang encoder in
graph, grid regions, loss DECREASES on a synthetic TSV fixture."""

import base64
import io
import os

import jax
import numpy as np
import pytest
from PIL import Image

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.data.clip_datasets import CLIPImgTxtPairTSVDataset
from cddmsl_tpu.engine.pretrain import grid_region_boxes, make_pretrain_step, pretrain_loop
from cddmsl_tpu.engine.train_loop import TrainState
from cddmsl_tpu.models.build import build_pretrain_fast_rcnn
from cddmsl_tpu.solver import build_optimizer
from cddmsl_tpu.utils.testing import materialize_params


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PretrainFastRCNN"
    cfg.TPU.BACKBONE_LAYERS = [1, 1, 1, 1]
    cfg.TPU.BACKBONE_WIDTH = 16
    cfg.TPU.EMBED_DIM = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.CLIP.PRETRAIN_NUM_CONCEPTS = 13
    cfg.MODEL.CLIP.TEXT_VOCAB_SIZE = 101
    cfg.MODEL.CLIP.TEXT_CONTEXT_LENGTH = 8
    cfg.MODEL.CLIP.TEXT_WIDTH = 32
    cfg.MODEL.CLIP.TEXT_HEADS = 4
    cfg.MODEL.CLIP.TEXT_LAYERS = 2
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = False
    return cfg


def _make_tsv(root, n=8, seed=0):
    rng = np.random.RandomState(seed)
    img_tsv = os.path.join(root, "imgs.tsv")
    txt_tsv = os.path.join(root, "texts.tsv")
    with open(img_tsv, "w") as fi, open(txt_tsv, "w") as ft:
        for i in range(n):
            arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            fi.write(f"img{i}\t{b64}\n")
            ft.write(f"img{i}\ta photo number {i}\n")
    return img_tsv, txt_tsv


def test_grid_region_boxes_static():
    boxes = grid_region_boxes(64, grid=3)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert (boxes[:, 2] <= 64 + 1e-5).all() and (boxes[:, 3] <= 64 + 1e-5).all()
    assert (boxes[:, 2] > boxes[:, 0]).all()


def test_pretrain_loss_decreases(tmp_path):
    cfg = _tiny_cfg()
    model = build_pretrain_fast_rcnn(cfg)
    img_tsv, txt_tsv = _make_tsv(str(tmp_path))
    ds = CLIPImgTxtPairTSVDataset([img_tsv], [txt_tsv])
    assert len(ds) == 8

    size = 64
    batches = ds.batches(4, image_size=size, seed=0)
    rng = jax.random.PRNGKey(0)
    params = materialize_params(
        lambda r: model.init(
            r,
            np.zeros((1, size, size, 3), np.float32),
            np.zeros((1, 2, 4), np.float32),
            np.zeros((1, 8), np.int32),
            method=model.pretrain_losses_with_text,
        ),
        rng,
    )
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)

    # fake host tokenizer: hash captions into the tiny vocab
    def tok(captions):
        out = np.zeros((len(captions), 8), np.int32)
        for i, c in enumerate(captions):
            ids = [1 + (hash(w) % 98) for w in c.split()][:6]
            out[i, : len(ids) + 2] = [99] + ids + [100 - 0]
        return out

    state, m0 = pretrain_loop(
        model, state, optimizer, batches, tok, max_iter=12, image_size=size, grid=2, log_period=4
    )
    assert np.isfinite(m0["total_loss"])
    # require decrease vs a fresh model's loss on a held-out batch
    step_fn = make_pretrain_step(model, optimizer)
    fresh = TrainState.create(params, optimizer)
    imgs, caps = next(ds.batches(4, image_size=size, seed=1))
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = (imgs.astype(np.float32) / 255.0 - mean) / std
    g2 = grid_region_boxes(size, 2)
    boxes = np.broadcast_to(g2, (4,) + g2.shape)
    _, m_init = step_fn(fresh, x, boxes, tok(caps))
    _, m_trained = step_fn(state, x, boxes, tok(caps))
    assert float(m_trained["total_loss"]) < float(m_init["total_loss"]), (
        float(m_init["total_loss"]), float(m_trained["total_loss"]),
    )


def test_pretrain_frozen_teacher_and_lang(tmp_path):
    cfg = _tiny_cfg()
    model = build_pretrain_fast_rcnn(cfg)
    img_tsv, txt_tsv = _make_tsv(str(tmp_path), n=4, seed=1)
    ds = CLIPImgTxtPairTSVDataset([img_tsv], [txt_tsv])
    size = 64
    rng = jax.random.PRNGKey(1)
    params = materialize_params(
        lambda r: model.init(
            r,
            np.zeros((1, size, size, 3), np.float32),
            np.zeros((1, 2, 4), np.float32),
            np.zeros((1, 8), np.int32),
            method=model.pretrain_losses_with_text,
        ),
        rng,
    )
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    step_fn = make_pretrain_step(model, optimizer)
    imgs, caps = next(ds.batches(4, image_size=size, seed=0))
    x = (imgs.astype(np.float32) / 255.0 - 0.45) / 0.27
    g2 = grid_region_boxes(size, 2)
    boxes = np.broadcast_to(g2, (4,) + g2.shape)
    tokens = np.ones((4, 8), np.int32)
    new_state, _ = step_fn(state, x, boxes, tokens)
    p0 = jax.device_get(params)["params"]
    p1 = jax.device_get(new_state.params)["params"]
    for sub in ("teacher_backbone", "lang_encoder"):
        a = jax.tree_util.tree_leaves(p0[sub])
        b = jax.tree_util.tree_leaves(p1[sub])
        assert all(np.array_equal(u, v) for u, v in zip(a, b)), sub
    np.testing.assert_array_equal(p0["concept_emb"], p1["concept_emb"])
    # student backbone moved
    assert not all(
        np.array_equal(u, v)
        for u, v in zip(jax.tree_util.tree_leaves(p0["backbone"]), jax.tree_util.tree_leaves(p1["backbone"]))
    )
