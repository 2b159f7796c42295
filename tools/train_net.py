#!/usr/bin/env python
"""Main training/eval CLI (the reference tools/train_net.py:148-195 surface):

  python tools/train_net.py --config-file configs/VOC-Experiments/faster_rcnn_CLIP_R_50_C4.yaml \
      MODEL.CLIP.TEXT_EMB_PATH .../voc_20_cls_emb.pth MODEL.WEIGHTS .../regionclip.pth
  python tools/train_net.py --eval-only --config-file ... MODEL.WEIGHTS ...

One process per HOST drives that host's chips. Past a single host, run the
same command on every host with --num-machines M --machine-rank r
--dist-url tcp://host0:port (or 'auto' on TPU pods) — launch() wires
jax.distributed and the mesh spans the pod (docs/MIGRATION.md
"Multi-host (pod scale)"); --num-gpus (process-per-device) has no TPU
analogue and is accepted for CLI compat only."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cddmsl_tpu.config import add_ateacher_config, get_cfg
from cddmsl_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup
from cddmsl_tpu.evaluation import verify_results


def setup(args):
    cfg = get_cfg()
    add_ateacher_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)

    trainer_name = cfg.SEMISUPNET.Trainer if "SEMISUPNET" in cfg else "default"
    if trainer_name == "ateacher" and not args.eval_only:
        from cddmsl_tpu.engine.mean_teacher import MeanTeacherTrainer

        trainer = MeanTeacherTrainer(cfg)
    else:
        trainer = DefaultTrainer(cfg)

    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        # TEST.EXPECTED_RESULTS refer to a single test set (reference
        # train_net.py:163-167); trainer.test asserts it internally too
        results = trainer.test(cfg, trainer.state)
        if len(results) == 1 and not verify_results(cfg, next(iter(results.values()))):
            sys.exit(1)  # golden-metric regression (quick_schedules CI)
        return results
    return trainer.train()


if __name__ == "__main__":
    from cddmsl_tpu.engine.defaults import launch

    args = default_argument_parser().parse_args()
    launch(
        main,
        num_gpus_per_machine=args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )
