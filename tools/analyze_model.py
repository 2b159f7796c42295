#!/usr/bin/env python
"""Model analysis CLI (reference tools/analyze_model.py): parameter table and
XLA cost analysis (FLOPs / bytes) for the flagship model.

  python tools/analyze_model.py [--config-file cfg.yaml] [--tasks parameter flop]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="")
    ap.add_argument("--tasks", nargs="+", default=["parameter", "flop"])
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.utils.analysis import flop_count, parameter_count, parameter_count_table

    if args.config_file:
        cfg = get_cfg()
        add_ateacher_config(cfg)
        cfg.merge_from_file(args.config_file)
        if args.opts:
            cfg.merge_from_list(args.opts)
    else:
        cfg = _flagship_cfg(tiny=False)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _synthetic_batch(1, 128, 160)
    params = model.init({"params": rng}, batch, rng, method=model.init_all)

    if "parameter" in args.tasks:
        print(f"total parameters: {parameter_count(params)/1e6:.2f}M")
        print(parameter_count_table(params["params"], max_depth=1))

    if "flop" in args.tasks:
        big = _synthetic_batch(1, 800, 1344, with_trgt=False)
        cost = flop_count(lambda p, b: model.apply(p, b, method=model.inference), params, big)
        flops = cost.get("flops", float("nan"))
        print(f"inference cost @800x1344: {flops/1e9:.1f} GFLOPs; "
              f"bytes accessed: {cost.get('bytes accessed', float('nan'))/1e9:.2f} GB")


if __name__ == "__main__":
    main()
