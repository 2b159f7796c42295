#!/usr/bin/env python
"""Training entry for python-file LazyConfigs (reference
tools/lazyconfig_train_net.py). Supports two conventions:

  * `main(cfg, args)` — the config owns the whole recipe
  * the d2 standard fragments — `model`, `optimizer`, `dataloader`,
    `train` (+ optional `lr_multiplier`) as in configs/common/* and
    configs/new_baselines/*: the built-in recipe instantiates them and runs
    a jitted train loop over the mesh (GeneralizedRCNN-family models)

  python tools/lazyconfig_train_net.py --config-file cfg.py [a.b=c ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def default_lazy_recipe(cfg, args, max_iter_override=None):
    """Instantiate the standard fragments and train (reference
    lazyconfig_train_net.py do_train). Returns the final metrics dict."""
    import jax
    import numpy as np

    from cddmsl_tpu.config.lazy import instantiate
    from cddmsl_tpu.data import register_all
    from cddmsl_tpu.engine import TrainState, make_eval_step, make_train_step
    from cddmsl_tpu.parallel import create_mesh, replicate, shard_batch
    from cddmsl_tpu.utils.testing import materialize_params

    register_all()
    train = dict(cfg["train"])
    if max_iter_override is not None:
        train["max_iter"] = max_iter_override

    # synthetic fixture auto-registration (this environment has no COCO)
    names = [
        cfg["dataloader"][k].get("dataset", "")
        for k in ("train", "test")
        if isinstance(cfg["dataloader"].get(k), dict)
    ]
    if any(n.startswith("synthetic_voc") for n in names):
        from cddmsl_tpu.data.catalog import DatasetCatalog
        from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick

        if "synthetic_voc_test" not in DatasetCatalog:
            fixture_root = os.path.join(train.get("output_dir", "./output"), "fixture")
            os.makedirs(fixture_root, exist_ok=True)
            register_synthetic_quick(fixture_root)

    # lr_multiplier (a schedule) replaces the optimizer's scalar lr
    if "lr_multiplier" in cfg:
        cfg["optimizer"]["lr"] = instantiate(cfg["lr_multiplier"])
    model = instantiate(cfg["model"])
    optimizer = instantiate(cfg["optimizer"])
    loader = instantiate(cfg["dataloader"]["train"])

    mesh = create_mesh(tuple(train.get("mesh_shape", (-1,))), ("data",))
    rng = jax.random.PRNGKey(int(train.get("seed", 0)))
    batch = next(loader)
    params = materialize_params(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all), rng, batch
    )
    state = TrainState.create(params, optimizer)
    step_fn = make_train_step(
        model, optimizer, enable_caption=False, kd_regularization=False, lr_schedule=None
    )
    metrics = {}
    with jax.sharding.set_mesh(mesh):
        state = replicate(state, mesh)
        for it in range(int(train["max_iter"])):
            state, metrics = step_fn(state, shard_batch(batch, mesh), jax.random.fold_in(rng, it))
            batch = next(loader)
    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    for k, v in metrics.items():
        assert np.isfinite(v), f"non-finite {k}={v}"
    print("lazy train done:", {k: round(v, 4) for k, v in metrics.items()})

    if args and getattr(args, "eval_only", False):
        pass  # train loop skipped by caller setting max_iter 0
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; the axon "
                         "sitecustomize otherwise pins the TPU tunnel)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cddmsl_tpu.config.lazy import LazyConfig, instantiate

    cfg = LazyConfig.load(args.config_file)
    if args.overrides:
        LazyConfig.apply_overrides(cfg, args.overrides)

    # the config file owns the recipe; `main(cfg, args)` hook if it defines
    # one; the d2 fragment convention runs the built-in recipe; otherwise
    # the conventional yacs-cfg path via cfg.yacs_cfg
    if "main" in cfg:
        return cfg["main"](cfg, args)
    if all(k in cfg for k in ("model", "optimizer", "dataloader", "train")):
        return default_lazy_recipe(cfg, args)
    if "yacs_cfg" in cfg:
        from cddmsl_tpu.engine.defaults import DefaultTrainer

        trainer = DefaultTrainer(instantiate(cfg["yacs_cfg"]))
        trainer.resume_or_load(resume=args.resume)
        return trainer.test() if args.eval_only else trainer.train()
    raise SystemExit("LazyConfig must define `main(cfg, args)`, the standard fragments, or `yacs_cfg`")


if __name__ == "__main__":
    main()
