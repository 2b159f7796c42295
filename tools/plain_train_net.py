#!/usr/bin/env python
"""Minimal training script without the DefaultTrainer abstractions
(reference tools/plain_train_net.py) — the explicit loop for users who want
to own it: build everything, iterate, log, checkpoint."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from cddmsl_tpu.checkpoint import DetectionCheckpointer
from cddmsl_tpu.config import add_ateacher_config, get_cfg
from cddmsl_tpu.data import build_detection_train_loader, register_all
from cddmsl_tpu.engine import TrainState, make_train_step
from cddmsl_tpu.engine.defaults import _init_batch, default_argument_parser, default_setup
from cddmsl_tpu.models import build_model
from cddmsl_tpu.parallel import mesh_from_cfg, replicate, shard_batch
from cddmsl_tpu.solver import build_lr_schedule, build_optimizer


def main(args):
    cfg = get_cfg()
    add_ateacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    register_all()

    model = build_model(cfg)
    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    params = model.init({"params": rng}, _init_batch(cfg), rng, method=model.init_all)
    optimizer = build_optimizer(cfg, params)
    state = TrainState.create(params, optimizer)
    ckptr = DetectionCheckpointer(cfg.OUTPUT_DIR)
    state = ckptr.resume_or_load(cfg.MODEL.WEIGHTS, state, args.resume)

    mesh = mesh_from_cfg(cfg)
    step = make_train_step(
        model, optimizer,
        enable_caption=cfg.TPU.ENABLE_CAPTION_CONSISTENCY,
        kd_regularization=cfg.MODEL.KD_REGULRAZIATION,
        caption_burnup_iters=cfg.SOLVER.CAPTION_BURNUP_ITERS,
        lr_schedule=build_lr_schedule(cfg),
    )
    loader = build_detection_train_loader(cfg)
    with jax.sharding.set_mesh(mesh):
        state = replicate(state, mesh)
        for it in range(int(jax.device_get(state.step)), cfg.SOLVER.MAX_ITER):
            state, metrics = step(state, shard_batch(next(loader), mesh), jax.random.fold_in(rng, it))
            if (it + 1) % 20 == 0:
                host = jax.device_get(metrics)
                print(f"iter {it}: " + "  ".join(f"{k}={float(v):.4g}" for k, v in host.items()))
            if cfg.SOLVER.CHECKPOINT_PERIOD and (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
                ckptr.save(f"model_{it:07d}", jax.device_get(state))
    ckptr.save("model_final", jax.device_get(state))


if __name__ == "__main__":
    from cddmsl_tpu.engine.defaults import launch

    _args = default_argument_parser().parse_args()
    launch(main, num_machines=_args.num_machines, machine_rank=_args.machine_rank,
           dist_url=_args.dist_url, args=(_args,))
