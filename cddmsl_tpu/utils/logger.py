"""Logging setup (reference detectron2/utils/logger.py:237 setup_logger):
colored console + optional file sink; singleton per name."""

import functools
import logging
import os
import sys
from typing import Optional


class _ColorFormatter(logging.Formatter):
    GREY, YELLOW, RED, RESET = "\x1b[38m", "\x1b[33m", "\x1b[31m", "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        if record.levelno >= logging.ERROR:
            return self.RED + msg + self.RESET
        if record.levelno >= logging.WARNING:
            return self.YELLOW + msg + self.RESET
        return msg


@functools.lru_cache()
def setup_logger(
    output: Optional[str] = None, name: str = "cddmsl_tpu", level: int = logging.INFO
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False

    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(
        _ColorFormatter("[%(asctime)s %(name)s %(levelname)s]: %(message)s", datefmt="%m/%d %H:%M:%S")
    )
    logger.addHandler(ch)

    if output:
        filename = output if output.endswith((".txt", ".log")) else os.path.join(output, "log.txt")
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setFormatter(
            logging.Formatter("[%(asctime)s %(name)s %(levelname)s]: %(message)s", datefmt="%m/%d %H:%M:%S")
        )
        logger.addHandler(fh)
    return logger


def log_every_n_seconds(level, msg, n=1, *, name="cddmsl_tpu"):
    import time

    key = (name, msg[:50])
    now = time.time()
    last = _LAST_LOG.get(key, 0)
    if now - last >= n:
        _LAST_LOG[key] = now
        logging.getLogger(name).log(level, msg)


_LAST_LOG = {}
