#!/usr/bin/env python
"""Throughput harness (the reference tools/benchmark.py surface): measure
dataloader-only, train-step, and eval throughput for a config.

  python tools/benchmark.py --config-file cfg.yaml --task train|eval|data
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def benchmark_data(cfg, iters=50):
    from cddmsl_tpu.data import build_detection_train_loader

    loader = build_detection_train_loader(cfg)
    next(loader)  # warm
    t0 = time.time()
    for _ in range(iters):
        next(loader)
    dt = time.time() - t0
    print(f"data: {iters / dt:.2f} batches/s ({cfg.SOLVER.IMS_PER_BATCH * iters / dt:.1f} imgs/s)")


def benchmark_train(cfg, iters=20):
    import jax

    from cddmsl_tpu.data import build_detection_train_loader
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    trainer = DefaultTrainer(cfg)
    loader = build_detection_train_loader(cfg)
    from cddmsl_tpu.parallel import replicate, shard_batch

    state = replicate(trainer.state, trainer.mesh)
    rng = jax.random.PRNGKey(0)
    with jax.sharding.set_mesh(trainer.mesh):
        for i in range(3):
            state, metrics = trainer.train_step(state, shard_batch(next(loader), trainer.mesh), jax.random.fold_in(rng, i))
        jax.device_get(metrics)
        t0 = time.time()
        for i in range(iters):
            state, metrics = trainer.train_step(state, shard_batch(next(loader), trainer.mesh), jax.random.fold_in(rng, 100 + i))
        jax.device_get(metrics)
        dt = time.time() - t0
    print(f"train: {dt / iters * 1000:.1f} ms/iter, {cfg.SOLVER.IMS_PER_BATCH * iters / dt:.2f} imgs/s")


def benchmark_eval(cfg, iters=20):
    import jax

    from cddmsl_tpu.data import build_detection_test_loader
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    trainer = DefaultTrainer(cfg)
    name = cfg.DATASETS.TEST[0]
    loader, n = build_detection_test_loader(cfg, name)
    batches = []
    for b, _ in loader:
        batches.append(b)
        if len(batches) >= 4:
            break
    det = trainer.eval_step(trainer.state.params, batches[0])
    jax.device_get(det.boxes)
    t0 = time.time()
    count = 0
    for i in range(iters):
        det = trainer.eval_step(trainer.state.params, batches[i % len(batches)])
        count += batches[0].image.shape[0]
    jax.device_get(det.boxes)
    dt = time.time() - t0
    print(f"eval: {dt / iters * 1000:.1f} ms/batch, {count / dt:.2f} imgs/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--task", default="train", choices=["train", "eval", "data"])
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data import register_all

    cfg = get_cfg()
    add_ateacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    register_all()
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](cfg)
