#!/usr/bin/env python
"""Golden-metric regression harness (the reference's quick_schedules CI
pattern: configs/quick_schedules/* + TEST.EXPECTED_RESULTS checked by
evaluation/testing.py verify_results via tools/train_net.py:163-167).

Runs each quick_schedules config against the deterministic synthetic VOC
fixture (cddmsl_tpu/data/datasets/synthetic.py), trains if MAX_ITER > 0,
evaluates, and checks TEST.EXPECTED_RESULTS. Nonzero exit on any failure.

  python tools/run_quick_schedules.py                 # all configs
  python tools/run_quick_schedules.py rcnn_instant    # name filter
"""

import glob
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Golden metrics are pinned on the CPU backend: deterministic across hosts
# (TPU matmuls use reduced MXU precision and would shift the pinned values).
os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cddmsl_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "quick_schedules")


def run_one(config_file: str, fixture_root: str) -> bool:
    from cddmsl_tpu.config import add_ateacher_config, get_cfg
    from cddmsl_tpu.data.datasets.synthetic import (
        register_synthetic_coco,
        register_synthetic_panoptic,
        register_synthetic_quick,
        register_synthetic_semseg,
    )
    from cddmsl_tpu.engine.defaults import DefaultTrainer
    from cddmsl_tpu.evaluation import verify_results

    register_synthetic_quick(fixture_root)
    register_synthetic_coco(fixture_root)
    register_synthetic_panoptic(fixture_root)
    register_synthetic_semseg(fixture_root)
    # keypoints fixture in its OWN subdir: the kp marker dots would change
    # the segm golden's images if written over the plain coco fixture
    register_synthetic_coco(
        os.path.join(fixture_root, "kp"), prefix="synthetic_kp", with_keypoints=True
    )

    cfg = get_cfg()
    add_ateacher_config(cfg)
    cfg.merge_from_file(config_file)
    cfg.OUTPUT_DIR = os.path.join(fixture_root, "out", os.path.basename(config_file))
    if cfg.MODEL.LOAD_PROPOSALS:
        # "fixture://proposals" sentinel -> the generated d2-schema pickle
        from cddmsl_tpu.data.datasets.synthetic import make_synthetic_proposals

        pf = make_synthetic_proposals(fixture_root)
        for key in ("PROPOSAL_FILES_TRAIN", "PROPOSAL_FILES_TEST"):
            setattr(cfg.DATASETS, key, tuple(
                pf if p == "fixture://proposals" else p
                for p in getattr(cfg.DATASETS, key)
            ))
    if cfg.MODEL.WEIGHTS.startswith("quick_schedules://"):
        # sentinel: a checkpoint produced by an earlier quick_schedules run
        # this invocation (the reference's inference_acc tests load model-zoo
        # checkpoints; this harness has no zoo, so inference goldens load the
        # training golden's overfit model_final)
        cfg.MODEL.WEIGHTS = os.path.join(
            fixture_root, "out", cfg.MODEL.WEIGHTS[len("quick_schedules://"):]
        )
        assert os.path.exists(cfg.MODEL.WEIGHTS), (
            f"{cfg.MODEL.WEIGHTS} missing — run the producing config first"
        )
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    if "SEMISUPNET" in cfg and cfg.SEMISUPNET.Trainer == "ateacher" and cfg.SOLVER.MAX_ITER > 0:
        from cddmsl_tpu.engine.mean_teacher import MeanTeacherTrainer

        trainer = MeanTeacherTrainer(cfg)
    else:
        trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    if cfg.SOLVER.MAX_ITER > 0:
        results = trainer.train()  # ends with a final test (+ internal verify)
    else:
        results = trainer.test(cfg, trainer.state)
    for ds, res in results.items():
        for task, metrics in res.items():
            shown = {k: round(v, 3) for k, v in metrics.items() if "-" not in k}
            print(f"  {ds}/{task}: {shown}", flush=True)
    if len(results) == 1:
        return verify_results(cfg, next(iter(results.values())))
    return all(verify_results(cfg, r) for r in results.values())


def main():
    name_filter = sys.argv[1] if len(sys.argv) > 1 else ""
    # producers before consumers: smoke tests, then training goldens (which
    # write model_final), then inference goldens (which load it)
    rank = lambda p: (0 if "instant" in p else 1 if "training" in p else 2, p)
    configs = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")), key=rank)
    configs = [c for c in configs if name_filter in os.path.basename(c)]
    if not configs:
        print(f"no quick_schedules configs matching {name_filter!r}")
        sys.exit(2)
    failures = []
    # ONE fixture root for the whole run: catalog registrations are process
    # global and must outlive every config
    with tempfile.TemporaryDirectory(prefix="qs_fixture_") as root:
        for c in configs:
            name = os.path.basename(c)
            print(f"=== {name} ===", flush=True)
            try:
                ok = run_one(c, root)
            except Exception:
                traceback.print_exc()
                ok = False
            print(f"=== {name}: {'PASS' if ok else 'FAIL'} ===", flush=True)
            if not ok:
                failures.append(name)
    if failures:
        print("FAILED:", ", ".join(failures))
        sys.exit(1)
    print(f"all {len(configs)} quick_schedules passed")


if __name__ == "__main__":
    main()
