"""YAML-activated consistency branches (r3 VERDICT next-round #7).

Each MODEL.CONSISTENCY_BRANCH value drives the full DefaultTrainer loop
end-to-end on the synthetic fixture through its quick-schedule config:
image / image_region add the language-free InfoNCE losses to the train
step (reference rcnn.py:471-522); caption_pl_img / caption_pl_region run
the interleaved pseudo-label caption step (rcnn.py:556-591)."""

import os

import jax
import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CASES = {
    "rcnn_consistency_image_instant_test.yaml": "image_cont_loss",
    "rcnn_consistency_image_region_instant_test.yaml": "image_region_cont_loss",
    "rcnn_caption_pl_instant_test.yaml": "token-pl_loss",
    "rcnn_caption_pl_region_instant_test.yaml": "token-pl-region_loss",
}


@pytest.mark.parametrize("config,loss_key", sorted(_CASES.items()))
def test_branch_trains_from_yaml(config, loss_key, tmp_path):
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.data.datasets.synthetic import register_synthetic_quick
    from cddmsl_tpu.engine.defaults import DefaultTrainer

    register_synthetic_quick(str(tmp_path / "fixture"))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(_REPO, "configs/quick_schedules", config))
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.DATASETS.TEST = ()  # train-path smoke; eval is covered elsewhere
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.TPU.FAST_INIT = True
    cfg.freeze()

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    p0 = np.asarray(
        jax.device_get(trainer.state.params)["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    )
    trainer.train()
    latest = {k: h.latest() for k, h in trainer.storage.histories().items()}
    assert loss_key in latest, sorted(latest)
    assert np.isfinite(latest[loss_key])
    p1 = np.asarray(
        jax.device_get(trainer.state.params)["params"]["backbone"]["layer3_0"]["conv1"]["kernel"]
    )
    assert not np.array_equal(p0, p1)  # the branch train loop really stepped
