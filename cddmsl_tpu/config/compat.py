"""Backward compatibility of configs (reference detectron2/config/compat.py,
229 LoC): upgrade/downgrade a config across VERSION numbers via per-version
rename converters, plus `guess_version` for files that don't carry VERSION.

Version history mirrors the reference's (the yaml surface is compat with d2
configs, so old d2 yamls must load):
  V1: MODEL.RPN_HEAD.NAME lived under its own node
  V2 (current): anchor settings moved to MODEL.ANCHOR_GENERATOR
"""

import logging
from typing import List, Optional, Tuple

from .cfg_node import CfgNode as CN

logger = logging.getLogger(__name__)

__all__ = ["upgrade_config", "downgrade_config", "guess_version"]

_LATEST = 2


def upgrade_config(cfg: CN, to_version: Optional[int] = None) -> CN:
    """Upgrade a config from its current version to a newer version."""
    cfg = cfg.clone()
    if to_version is None:
        to_version = _LATEST
    assert cfg.VERSION <= to_version, f"Cannot upgrade from v{cfg.VERSION} to v{to_version}!"
    for k in range(cfg.VERSION, to_version):
        converter = globals()["ConverterV" + str(k + 1)]
        converter.upgrade(cfg)
        cfg.VERSION = k + 1
    return cfg


def downgrade_config(cfg: CN, to_version: int) -> CN:
    """Downgrade a config to an older version. NOTE (as the reference warns):
    a general downgrade may be lossy — only the renamed keys move back."""
    cfg = cfg.clone()
    assert cfg.VERSION >= to_version, f"Cannot downgrade from v{cfg.VERSION} to v{to_version}!"
    for k in range(cfg.VERSION, to_version, -1):
        converter = globals()["ConverterV" + str(k)]
        converter.downgrade(cfg)
        cfg.VERSION = k - 1
    return cfg


def guess_version(cfg: CN, filename: str = "") -> int:
    """Guess the version of a partial yaml that carries no VERSION key
    (reference compat.py guess_version): presence of a renamed key pins it."""
    ret = None
    if "VERSION" in cfg and cfg["VERSION"] is not None:
        ret = cfg["VERSION"]
    elif _has(cfg, "MODEL.RPN_HEAD"):
        ret = 1
    if ret is not None:
        logger.info("Config '%s' is version %s", filename, ret)
        return ret
    logger.warning("Config '%s' has no VERSION; assuming current (%s)", filename, _LATEST)
    return _LATEST


def _has(cfg: CN, path: str) -> bool:
    node = cfg
    for p in path.split("."):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


def _get(cfg: CN, path: str):
    node = cfg
    for p in path.split("."):
        node = node[p]
    return node


def _set(cfg: CN, path: str, value) -> None:
    node = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        if p not in node:
            node[p] = CN()
        node = node[p]
    node[parts[-1]] = value


def _del(cfg: CN, path: str) -> None:
    node = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        node = node[p]
    del node[parts[-1]]
    # prune emptied parents
    if len(parts) > 1 and not _get(cfg, ".".join(parts[:-1])):
        _del(cfg, ".".join(parts[:-1]))


def _rename(cfg: CN, old: str, new: str) -> None:
    if not _has(cfg, old):
        return
    _set(cfg, new, _get(cfg, old))
    _del(cfg, old)


class _RenameConverter:
    RENAME: List[Tuple[str, str]] = []

    @classmethod
    def upgrade(cls, cfg: CN) -> None:
        for old, new in cls.RENAME:
            _rename(cfg, old, new)

    @classmethod
    def downgrade(cls, cfg: CN) -> None:
        for old, new in cls.RENAME[::-1]:
            _rename(cfg, new, old)


class ConverterV1(_RenameConverter):
    RENAME = [("MODEL.RPN_HEAD.NAME", "MODEL.RPN.HEAD_NAME")]


class ConverterV2(_RenameConverter):
    """Anchor settings moved under MODEL.ANCHOR_GENERATOR (reference
    ConverterV2: RPN- or RETINANET-scoped anchor keys upgrade into the
    shared generator node; downgrade mirrors them into both)."""

    @classmethod
    def upgrade(cls, cfg: CN) -> None:
        if _has(cfg, "MODEL.RETINANET.ANCHOR_SIZES"):
            _rename(cfg, "MODEL.RETINANET.ANCHOR_SIZES", "MODEL.ANCHOR_GENERATOR.SIZES")
            _rename(
                cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS", "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS"
            )
            if _has(cfg, "MODEL.RPN.ANCHOR_SIZES"):
                _del(cfg, "MODEL.RPN.ANCHOR_SIZES")
            if _has(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS"):
                _del(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        else:
            _rename(cfg, "MODEL.RPN.ANCHOR_SIZES", "MODEL.ANCHOR_GENERATOR.SIZES")
            _rename(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS", "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS")

    @classmethod
    def downgrade(cls, cfg: CN) -> None:
        _rename(cfg, "MODEL.ANCHOR_GENERATOR.SIZES", "MODEL.RPN.ANCHOR_SIZES")
        _rename(cfg, "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS", "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        if _has(cfg, "MODEL.RPN.ANCHOR_SIZES"):
            _set(cfg, "MODEL.RETINANET.ANCHOR_SIZES", _get(cfg, "MODEL.RPN.ANCHOR_SIZES"))
            _set(
                cfg,
                "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS",
                _get(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS"),
            )
