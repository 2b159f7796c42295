"""Checkpoint save/restore (orbax) + torch-dialect loading.

The TPU-native DetectionCheckpointer (reference detectron2/checkpoint/
detection_checkpoint.py:16-131): native checkpoints are orbax trees holding
{params, opt_state, step}; `resume_or_load` restores the latest native
checkpoint if present (tracking a `last_checkpoint` marker like fvcore),
otherwise converts a torch checkpoint via checkpoint/convert_torch.py.

`async_save=True` swaps in orbax's AsyncCheckpointer: the state is fetched
to host synchronously (cheap; overlaps the next step's dispatch) and
serialization + disk IO run on a background thread, so the 90k-iteration
recipe never stalls on CHECKPOINT_PERIOD saves. `wait_until_finished()` is
called automatically before any restore and must be called once at the end
of training (DefaultTrainer does).

`max_to_keep` > 0 keeps only the newest K periodic checkpoints on disk
(fvcore PeriodicCheckpointer's max_to_keep, reference engine/defaults.py
hook wiring); `model_final` is never collected.
"""

import logging
import os
import shutil
from typing import Any, List, Optional

import jax

from .convert_torch import load_rcnn_weights

logger = logging.getLogger(__name__)

_LAST = "last_checkpoint"
_PROTECTED = ("model_final",)


class DetectionCheckpointer:
    def __init__(self, save_dir: str, async_save: bool = False, max_to_keep: int = 0):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._async = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self.max_to_keep = max_to_keep
        self._recent: List[str] = []  # GC ring of periodic save names

    # ---- native ----
    def save(self, name: str, state: Any) -> str:
        """Multi-host-safe: EVERY process must enter the orbax save (orbax
        runs its own cross-process barriers — a rank-0-only call deadlocks
        on `sync_global_devices('Checkpointer:save_start')`). Orbax then
        writes host (numpy) leaves from the primary process only, and for a
        cross-process-SHARDED state (multi-host FSDP) each process writes
        its own shards — so the tree is fetched to host only when fully
        addressable/replicated and passed through as live jax.Arrays
        otherwise. The `last_checkpoint` marker is rank-0's to write."""
        from ..parallel import multihost

        path = os.path.abspath(os.path.join(self.save_dir, name))
        distributed = multihost.get_world_size() > 1 and any(
            isinstance(l, jax.Array) and not l.is_fully_addressable and not l.is_fully_replicated
            for l in jax.tree_util.tree_leaves(state)
        )
        if self._async:
            # serialize the previous save fully before starting a new one
            self._ckptr.wait_until_finished()
        self._ckptr.save(path, state if distributed else jax.device_get(state), force=True)
        if multihost.is_main_process():
            with open(os.path.join(self.save_dir, _LAST), "w") as f:
                f.write(name)
            logger.info("Saved checkpoint to %s%s", path, " (async)" if self._async else "")
        multihost.synchronize()  # no host proceeds (e.g. into restore) mid-write
        if name not in _PROTECTED:
            self._recent.append(name)
            self._gc()
        return path

    def _gc(self):
        if self.max_to_keep <= 0:
            return
        from ..parallel import multihost

        if not multihost.is_main_process():
            # shared save_dir: rank 0 owns deletion (ring state is identical
            # on every process, so trimming _recent everywhere stays in sync)
            while len(self._recent) > self.max_to_keep:
                self._recent.pop(0)
            return
        while len(self._recent) > self.max_to_keep:
            victim = self._recent.pop(0)
            vpath = os.path.join(self.save_dir, victim)
            # never delete the resume target
            if self.get_checkpoint_file() == vpath:
                continue
            if os.path.isdir(vpath):
                shutil.rmtree(vpath, ignore_errors=True)
                logger.info("GC'd old checkpoint %s (max_to_keep=%d)", vpath, self.max_to_keep)

    def wait_until_finished(self):
        if self._async:
            self._ckptr.wait_until_finished()

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, _LAST))

    def get_checkpoint_file(self) -> Optional[str]:
        marker = os.path.join(self.save_dir, _LAST)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return os.path.join(self.save_dir, f.read().strip())

    def load_native(self, path: str, target: Any) -> Any:
        self.wait_until_finished()  # the newest save may still be in flight
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
