from .cfg_node import CfgNode
from .defaults import get_default_cfg
from .ateacher import add_ateacher_config


def get_cfg() -> CfgNode:
    """Return a fresh copy of the default config (reference: get_cfg())."""
    return get_default_cfg()


__all__ = ["CfgNode", "get_cfg", "get_default_cfg", "add_ateacher_config"]
