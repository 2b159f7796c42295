"""Trainer hooks (reference detectron2/engine/hooks.py surface).

A light hook protocol for the python-side of the loop (the jitted step has no
hooks by design — anything per-step lives in the compiled program). Provided:
`CallbackHook` (:42), `IterationTimer` (:77), `PeriodicWriter` (:149),
`PeriodicCheckpointer` (:183), `LRScheduler` (:202, a no-op here — the LR
schedule is inside the optimizer), `EvalHook` (:335), and `ProfilerHook`
(the AutogradProfiler analogue :271 using jax.profiler traces).
"""

import logging
import os
import time
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class CallbackHook(HookBase):
    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._after_train = after_train
        self._before_step = before_step
        self._after_step = after_step

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Average per-iteration wall time excluding hook overhead
    (reference hooks.py:77-148)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup = warmup_iter
        self._start = None
        self._step_start = None
        self._total = 0.0
        self._count = 0

    def before_train(self):
        self._start = time.time()

    def before_step(self):
        self._step_start = time.time()

    def after_step(self):
        self._count += 1
        if self._count > self._warmup:
            self._total += time.time() - self._step_start

    def after_train(self):
        n = max(self._count - self._warmup, 1)
        logger.info(
            "Total training time: %.1fs (%.4fs/it over %d iterations)",
            time.time() - self._start,
            self._total / n,
            n,
        )


class PeriodicWriter(HookBase):
    def __init__(self, writers: List, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        storage = self.trainer.storage
        if (storage.iter + 1) % self._period == 0:
            for w in self._writers:
                w.write(storage)

    def after_train(self):
        for w in self._writers:
            w.write(self.trainer.storage)  # flush the tail
            w.close()


class PeriodicCheckpointer(HookBase):
    def __init__(self, checkpointer, period: int):
        self._ckptr = checkpointer
        self._period = period

    def after_step(self):
        it = self.trainer.storage.iter
        if self._period and (it + 1) % self._period == 0:
            self._ckptr.save(f"model_{it:07d}", self.trainer.state)


class EvalHook(HookBase):
    def __init__(self, period: int, eval_fn: Callable):
        self._period = period
        self._fn = eval_fn

    def after_step(self):
        it = self.trainer.storage.iter
        if self._period and (it + 1) % self._period == 0:
            self._fn()
    # (no after_train eval: DefaultTrainer.train runs the final test itself)


class ProfilerHook(HookBase):
    """Capture a jax.profiler trace for selected iterations (the
    AutogradProfiler/chrome-trace analogue; view with xprof/tensorboard)."""

    def __init__(self, start_iter: int, end_iter: int, output_dir: str):
        self._range = (start_iter, end_iter)
        self._dir = output_dir
        self._active = False

    def before_step(self):
        import jax

        if self.trainer.storage.iter == self._range[0]:
            os.makedirs(self._dir, exist_ok=True)
            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        import jax

        if self._active and self.trainer.storage.iter >= self._range[1]:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace written to %s", self._dir)


class LRScheduler(HookBase):
    """No-op for API parity: the LR schedule is a pure function of the step
    inside the optimizer (solver/build.py), not python-side state."""
