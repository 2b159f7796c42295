#!/usr/bin/env python
"""Training entry for python-file LazyConfigs (reference
tools/lazyconfig_train_net.py). The config file defines `model` (a LazyCall
or a built module), `optimizer`, `dataloader`, `train` dicts.

  python tools/lazyconfig_train_net.py --config-file cfg.py [a.b=c ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from cddmsl_tpu.config.lazy import LazyConfig, instantiate

    cfg = LazyConfig.load(args.config_file)
    if args.overrides:
        LazyConfig.apply_overrides(cfg, args.overrides)

    # the config file owns the recipe; `main(cfg, args)` hook if it defines
    # one, otherwise the conventional yacs-cfg path via cfg.yacs_cfg
    if "main" in cfg:
        return cfg["main"](cfg, args)
    if "yacs_cfg" in cfg:
        from cddmsl_tpu.engine.defaults import DefaultTrainer

        trainer = DefaultTrainer(instantiate(cfg["yacs_cfg"]))
        trainer.resume_or_load(resume=args.resume)
        return trainer.test() if args.eval_only else trainer.train()
    raise SystemExit("LazyConfig must define `main(cfg, args)` or `yacs_cfg`")


if __name__ == "__main__":
    main()
