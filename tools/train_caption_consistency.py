#!/usr/bin/env python
"""Alias entry point for the caption-consistency trainer (the reference ships
tools/train_caption_consistency.py:179 using the same Trainer as train_net.py
without the ateacher config extension)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cddmsl_tpu.config import get_cfg
from cddmsl_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        return trainer.test(cfg, trainer.state)
    return trainer.train()


if __name__ == "__main__":
    from cddmsl_tpu.engine.defaults import launch

    _args = default_argument_parser().parse_args()
    launch(main, num_machines=_args.num_machines, machine_rank=_args.machine_rank,
           dist_url=_args.dist_url, args=(_args,))
