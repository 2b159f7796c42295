"""OOM-retry helper (reference detectron2/utils/memory.py:26-84
retry_if_cuda_oom): retry once after clearing JAX caches, then fall back to
CPU execution."""

import functools
import logging

logger = logging.getLogger(__name__)


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s or "out of memory" in s.lower()


def retry_if_tpu_oom(func):
    """Decorator: on device OOM, clear live buffers/caches and retry; if it
    OOMs again, re-run on CPU (the reference moves inputs to CPU)."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return func(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.warning("OOM in %s; clearing caches and retrying", func.__name__)
            jax.clear_caches()
        try:
            return func(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
            logger.warning("OOM again; retrying %s on CPU", func.__name__)
            import jax

            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                cpu_args = jax.device_put(args, cpu)
                return func(*cpu_args, **kwargs)

    return wrapped


# alias matching the reference name for drop-in use
retry_if_cuda_oom = retry_if_tpu_oom
