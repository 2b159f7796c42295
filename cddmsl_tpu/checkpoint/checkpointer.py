"""Checkpoint save/restore (orbax) + torch-dialect loading.

The TPU-native DetectionCheckpointer (reference detectron2/checkpoint/
detection_checkpoint.py:16-131): native checkpoints are orbax trees holding
{params, opt_state, step}; `resume_or_load` restores the latest native
checkpoint if present (tracking a `last_checkpoint` marker like fvcore),
otherwise converts a torch checkpoint via checkpoint/convert_torch.py."""

import logging
import os
from typing import Any, Optional

import jax
import numpy as np

from .convert_torch import load_rcnn_weights

logger = logging.getLogger(__name__)

_LAST = "last_checkpoint"


class DetectionCheckpointer:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ckptr = ocp.PyTreeCheckpointer()

    # ---- native ----
    def save(self, name: str, state: Any) -> str:
        path = os.path.abspath(os.path.join(self.save_dir, name))
        host_state = jax.device_get(state)
        self._ckptr.save(path, host_state, force=True)
        with open(os.path.join(self.save_dir, _LAST), "w") as f:
            f.write(name)
        logger.info("Saved checkpoint to %s", path)
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, _LAST))

    def get_checkpoint_file(self) -> Optional[str]:
        marker = os.path.join(self.save_dir, _LAST)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return os.path.join(self.save_dir, f.read().strip())

    def load_native(self, path: str, target: Any) -> Any:
        restored = self._ckptr.restore(os.path.abspath(path), item=jax.device_get(target))
        logger.info("Restored checkpoint from %s", path)
        return restored

    # ---- mixed entry (reference resume_or_load, defaults.py:406-428) ----
    def resume_or_load(self, weights_path: str, state: Any, resume: bool = True) -> Any:
        if resume and self.has_checkpoint():
            return self.load_native(self.get_checkpoint_file(), state)
        if weights_path:
            if weights_path.endswith((".pth", ".pt", ".pkl")):
                new_params = load_rcnn_weights(state.params, weights_path)
                return state.replace(params=new_params)
            return self.load_native(weights_path, state)
        return state
