"""Benchmark the serving-path int8 PTQ (cddmsl_tpu/quant/ptq.py) on TPU.

Times the flagship CLIP-RN50 C4 inference step fp (bf16) vs with the res5
RoI stage quantized to int8 (TPU.QUANT_EVAL semantics: per-channel int8
weights, absmax-calibrated per-tensor activations, s8xs8->s32 MXU convs).
Reference has no quantized serving path (it serves fp32/amp); this is a
TPU-native extension, numbers recorded in docs/PERF.md.

Usage: python tools/bench_quant_eval.py  (runs on the attached TPU chip)
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cddmsl")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_cfg, _synthetic_batch
    from cddmsl_tpu.engine.train_loop import (
        make_calib_step,
        make_eval_step,
        make_eval_step_quant,
    )
    from cddmsl_tpu.models import build_model
    from cddmsl_tpu.quant import prepare_quant_res5

    batch_size, h, w = 4, 800, 1344
    warmup, iters = 3, 20

    cfg = _flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    params = jax.jit(
        lambda r, b: model.init({"params": r}, b, r, method=model.init_all)
    )(rng, _synthetic_batch(1, 128, 160))
    log(f"init {time.time()-t0:.1f}s")

    batch = _synthetic_batch(batch_size, h, w, g=24, seed=1, with_trgt=False)

    # calibrate on 2 synthetic batches (the trainer uses the first
    # TPU.QUANT_CALIB_BATCHES real eval batches; distribution is what matters,
    # the timing doesn't depend on it)
    t0 = time.time()
    crops = [
        np.asarray(
            jax.device_get(make_calib_step(model)(params, _synthetic_batch(batch_size, h, w, g=24, seed=s, with_trgt=False))),
            np.float32,
        )
        for s in (1, 2)
    ]
    qblocks, scales = prepare_quant_res5(
        jax.device_get(params)["params"]["backbone"], crops
    )
    log(f"calibration {time.time()-t0:.1f}s")

    results = {}
    for name, step in (
        ("fp", make_eval_step(model)),
        ("int8-res5", make_eval_step_quant(model, qblocks, scales)),
    ):
        t0 = time.time()
        for _ in range(warmup):
            out = step(params, batch)
        jax.device_get(out.scores)
        log(f"{name}: warmup+compile {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(iters):
            out = step(params, batch)
        scores = jax.device_get(out.scores)
        dt = (time.time() - t0) / iters
        results[name] = dt
        log(
            f"{name}: {dt*1000:.1f} ms/batch-{batch_size} "
            f"({batch_size/dt:.1f} imgs/s), finite={bool(np.isfinite(scores).all())}"
        )

    log(f"speedup: {results['fp']/results['int8-res5']:.3f}x")


if __name__ == "__main__":
    main()
